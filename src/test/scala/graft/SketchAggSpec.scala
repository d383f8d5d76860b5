package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchAggs._

/** KLL quantile and Theta set-operation sketch aggregates: accuracy
  * bounds, merge-of-parts ≡ one-shot (the mergeable-summaries
  * property), exact-mode equality, persistence through parquet, and
  * serialize/deserialize under forced partial merges.
  */
class SketchAggSpec extends SparkTestBase {
  import spark.implicits._

  // 1..10000 keyed so we can split into deterministic "epochs";
  // repartition(7) forces partial-buffer serialize/merge paths
  private lazy val vals = (1 to 10000)
    .map(i => (i % 5, i.toDouble)).toDF("epoch", "v").repartition(7)

  test("kll: one-shot quantiles land within the k=200 rank bound") {
    val m = vals.agg(kllSketchAgg(col("v")).as("sk"))
      .select(kllQuantile(col("sk"), 0.5).as("p50"),
        kllQuantile(col("sk"), 0.99).as("p99"))
      .as[(Double, Double)].head()
    assert(math.abs(m._1 - 5000.0) <= 10000 * 0.0165 + 1,
      s"p50 ${m._1} outside rank bound")
    assert(math.abs(m._2 - 9900.0) <= 10000 * 0.0165 + 1,
      s"p99 ${m._2} outside rank bound")
  }

  test("kll: merged epoch sketches answer within the same bound, incl. through parquet") {
    val perEpoch = vals.groupBy("epoch")
      .agg(kllSketchAgg(col("v")).as("sk")).cache()
    assert(perEpoch.count() == 5)
    def p50Of(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(kllMergeAgg(col("sk")).as("m"))
        .select(kllQuantile(col("m"), 0.5)).as[Double].head()
    val direct = p50Of(perEpoch)
    assert(math.abs(direct - 5000.0) <= 10000 * 0.0165 + 1)
    // persistence: sketch BYTES must survive a parquet round trip
    // unchanged — the "epoch seals once, rolls up forever" contract.
    // (Merged READOUTS are only bound-equal across layouts: KLL merge
    // is order-sensitive, and a re-read changes partition order.)
    val dir = java.nio.file.Files
      .createTempDirectory("kll_store").toString
    perEpoch.write.mode("overwrite").parquet(dir)
    def bytesByEpoch(df: org.apache.spark.sql.DataFrame) =
      df.select("epoch", "sk").as[(Int, Array[Byte])].collect()
        .map { case (e, b) => e -> b.toSeq }.toMap
    assert(bytesByEpoch(spark.read.parquet(dir)) == bytesByEpoch(perEpoch),
      "stored sketch bytes must round-trip unchanged")
    val reread = p50Of(spark.read.parquet(dir))
    assert(math.abs(reread - 5000.0) <= 10000 * 0.0165 + 1)
    // merging a SUBSET estimates that subset's distribution: epoch 0
    // holds multiples of 5, so its p50 is ~5000 of a 2000-point comb
    val sub = spark.read.parquet(dir).filter($"epoch" === 0)
    val p50sub = p50Of(sub)
    assert(math.abs(p50sub - 5000.0) <= 10000 * 0.0165 + 5)
  }

  test("kll: empty input yields an empty sketch and null quantile") {
    val q = vals.filter($"v" < 0)
      .agg(kllSketchAgg(col("v")).as("sk"))
      .select(kllQuantile(col("sk"), 0.5)).as[Option[Double]].head()
    assert(q.isEmpty)
  }

  test("theta: exact mode (< 2^lgK values) estimates are exactly right") {
    // 311 distinct users, far under the 4096 nominal entries → the
    // sketch holds every hash and the estimate is exact
    val ev = (1 to 5000).map(i => (i % 2 == 0, s"user${i % 311}"))
      .toDF("h1", "uid").repartition(7)
    val sk = ev.groupBy("h1").agg(thetaSketchAgg(col("uid")).as("sk"))
    val (both, any) = sk.agg(
      thetaEstimate(thetaIntersectAgg(col("sk"))).as("b"),
      thetaEstimate(thetaUnionAgg(col("sk"))).as("a"))
      .as[(Double, Double)].head()
    // i%2 splits users by parity of i: user k appears with both
    // parities (k and k+311 differ in parity since 311 is odd) → all
    // 311 users are in both halves
    assert(any == 311.0, s"union estimate $any != 311")
    assert(both == 311.0, s"intersection estimate $both != 311")
  }

  test("theta: disjoint halves intersect to zero, union adds up") {
    val ev = (0 until 1000)
      .map(i => (i < 500, s"u$i")).toDF("h1", "uid").repartition(7)
    val sk = ev.groupBy("h1").agg(thetaSketchAgg(col("uid")).as("sk"))
    val (both, any) = sk.agg(
      thetaEstimate(thetaIntersectAgg(col("sk"))).as("b"),
      thetaEstimate(thetaUnionAgg(col("sk"))).as("a"))
      .as[(Double, Double)].head()
    assert(both == 0.0 && any == 1000.0)
  }

  test("theta: intersect over an empty group is null (universal-set identity)") {
    val sk = (1 to 10).map(i => (i, s"u$i")).toDF("k", "uid")
      .filter($"k" > 100)
      .agg(thetaSketchAgg(col("uid")).as("sk"))
    val r = sk.agg(thetaIntersectAgg(col("sk")).as("i"))
      .select(col("i").isNull).as[Boolean].head()
    // the inner agg over zero rows produced ONE empty sketch, so the
    // intersection has a result (the empty set) — not null
    assert(!r)
    val est = sk.agg(thetaEstimate(thetaIntersectAgg(col("sk"))))
      .as[Double].head()
    assert(est == 0.0)
  }

  test("theta sketches registered as SQL functions") {
    (1 to 100).map(i => (i % 3, s"u${i % 17}")).toDF("g", "uid")
      .createOrReplaceTempView("theta_in")
    val est = spark.sql(
      """SELECT theta_estimate(theta_union_agg(sk)) FROM
        (SELECT g, theta_sketch_agg(uid) AS sk FROM theta_in GROUP BY g)""")
      .as[Double].head()
    assert(est == 17.0)
    val p50 = spark.sql(
      """SELECT kll_quantile(kll_merge_agg(sk), 0.5) FROM
        (SELECT g, kll_sketch_agg(length(uid)) AS sk
         FROM theta_in GROUP BY g)""")
    assert(!p50.isEmpty)
  }

  test("freq: hard guarantees hold under forced evictions, any layout") {
    import graft.functions.SketchAggs._
    // skewed stream: term t0 dominates, long tail forces evictions in
    // a map of 8 counters (vocab 200 >> 8)
    val rows = (0 until 5000).map { i =>
      val term = if (i % 3 == 0) "t0" else s"t${1 + i % 199}"
      (i % 4, term)
    }
    val df = rows.toDF("g", "term")
    val exact = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    for (shuffled <- Seq(df, df.repartition(13))) {
      val m = shuffled.groupBy(col("g"))
        .agg(freqSketchAgg(col("term"), 8).as("s"))
        .agg(freqMergeAgg(col("s"), 8).as("m"))
        .select(freqItems(col("m")).as("items"),
          freqMaxError(col("m")).as("err"))
        .head()
      val err = m.getLong(1)
      assert(err > 0, "map of 8 over vocab 200 must have evicted")
      val items = m.getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      // no false negatives: every item with true count > maxError tracked
      exact.filter(_._2 > err).keys.foreach { t =>
        assert(items.contains(t), s"heavy item $t missing (err $err)")
      }
      // bounds bracket the true count for every tracked exact item
      items.foreach { case (t, (lb, ub)) =>
        exact.get(t).foreach(c =>
          assert(lb <= c && c <= ub, s"$t: true $c outside [$lb,$ub]"))
      }
    }
  }

  test("freq: exact regime (no evictions) reports exact counts; parquet roundtrip") {
    import graft.functions.SketchAggs._
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("t")
    val dir = java.nio.file.Files.createTempDirectory("graft_freq").toString
    df.agg(freqSketchAgg(col("t"), 64).as("s")).write
      .mode("overwrite").parquet(dir)
    val m = spark.read.parquet(dir)
      .agg(freqMergeAgg(col("s"), 64).as("m"))
      .select(freqItems(col("m")).as("items"),
        freqMaxError(col("m")).as("err")).head()
    assert(m.getLong(1) == 0L)
    val got = m.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("freq sketches registered as SQL functions") {
    Seq("x", "x", "y").toDF("t").createOrReplaceTempView("freq_in")
    val n = spark.sql(
      """SELECT size(freq_items(freq_merge_agg(s))) FROM
        (SELECT freq_sketch_agg(t, 8) AS s FROM freq_in)""").head().getInt(0)
    assert(n == 2)
  }
}

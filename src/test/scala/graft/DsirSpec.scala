package graft

import org.apache.spark.sql.functions._

import graft.text.Dsir

/** DSIR importance weighting pinned the LangModel way: a naive
  * sequential reference (re-hash and re-count everything in plain
  * Scala, same smoothing, same 9-dp rounding, same decimal sums), a
  * synthetic separation case where the right answer is forced, layout
  * independence, and determinism of the Gumbel-top-k draw.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Plain-Scala replay of fit + scoreDocs: lowercase \S+ tokens,
    * unigrams ++ adjacent bigrams, md5-prefix bucket, add-1 smoothing
    * over buckets, per-bucket log ratio rounded to 9 dp, exact decimal
    * per-doc sum.
    */
  private def naiveWeights(
      target: Seq[(Long, String)],
      raw: Seq[(Long, String)],
      buckets: Int): Map[Long, (Long, Double, Double)] = {
    def toks(t: String): Seq[String] =
      "\\S+".r.findAllIn(t.toLowerCase(java.util.Locale.ROOT)).toSeq
    def grams(t: String): Seq[String] = {
      val w = toks(t)
      w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val hexN = (math.log(buckets.toDouble) / math.log(16.0)).round.toInt
    def bucket(g: String): Int =
      Integer.parseInt(md5hex(g).substring(0, hexN), 16)
    val tc = target.flatMap(d => grams(d._2)).map(bucket)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rc = raw.flatMap(d => grams(d._2)).map(bucket)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nt = tc.values.sum.toDouble
    val nr = rc.values.sum.toDouble
    def lr(b: Int): BigDecimal = {
      val v = math.log((tc.getOrElse(b, 0L) + 1.0) / (nt + buckets)) -
        math.log((rc.getOrElse(b, 0L) + 1.0) / (nr + buckets))
      // Spark round(x, 9): HALF_UP over the shortest decimal repr
      BigDecimal(java.math.BigDecimal.valueOf(v)
        .setScale(9, java.math.RoundingMode.HALF_UP)).setScale(12)
    }
    raw.map { case (id, t) =>
      val gs = grams(t)
      val sum = gs.map(g => lr(bucket(g)))
        .foldLeft(BigDecimal(0).setScale(12))(_ + _)
      // logw_sum emits as the same 9-dp-rounded double as dsir_logw
      // (the certified-surface rule: DECIMAL accumulates, double emits)
      id -> ((gs.size.toLong, sum.toDouble, sum.toDouble))
    }.toMap
  }

  /** The md5-derived Gumbel perturbation, replayed. */
  private def gumbel(id: Long): Double = {
    val v = java.lang.Long.parseLong(
      md5hex(id.toString).substring(0, 12), 16).toDouble
    val u = (v + 1.0) / (math.pow(16.0, 12.0) + 2.0)
    -math.log(-math.log(u))
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the fish"),
    (3L, "a dog sat on a log and the dog ate"),
    (4L, "one-token"),
    (5L, ""),
    (6L, "the the the the"),
    (7L, "fish mat cat log"))
  private val targetIds = Set(1L, 2L)

  test("scoreDocs matches the naive sequential reference") {
    val docs = corpus.toDF("doc_id", "text")
    val model = Dsir.fit(
      docs.filter(col("doc_id").isin(targetIds.toSeq: _*)),
      docs, col("text"), buckets = 256)
    val got = Dsir.scoreDocs(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val want = naiveWeights(
      corpus.filter(d => targetIds(d._1)), corpus, 256)
    assert(got == want,
      s"diverged: ${got.toSeq.sortBy(_._1).zip(want.toSeq.sortBy(_._1))
        .filter(p => p._1 != p._2)}")
  }

  test("fitWithin (one fused count pass) equals fit on the filtered slice") {
    val docs = corpus.toDF("doc_id", "text")
    val two = Dsir.fit(
      docs.filter(col("doc_id").isin(targetIds.toSeq: _*)),
      docs, col("text"), buckets = 256)
    val one = Dsir.fitWithin(
      docs, col("doc_id").isin(targetIds.toSeq: _*),
      col("text"), buckets = 256)
    assert(one.buckets == two.buckets)
    val r1 = one.ratios.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val r2 = two.ratios.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(r1 == r2, "fused-count model diverged from the two-pass fit")
  }

  test("weights separate on-target from off-target vocabulary") {
    // two disjoint vocabularies; the raw pool mixes both. Every doc
    // drawn from the target vocabulary must outweigh every off-target
    // doc — on disjoint vocab the ranking is forced, not statistical.
    val onTarget = (0 until 8).map(i =>
      (100L + i, s"alpha beta gamma delta epsilon w$i"))
    val offTarget = (0 until 8).map(i =>
      (200L + i, s"zeta eta theta iota kappa v$i"))
    val raw = (onTarget ++ offTarget).toDF("doc_id", "text")
    val target = (0 until 4).map(i =>
      (300L + i, s"alpha beta gamma delta epsilon t$i"))
      .toDF("doc_id", "text")
    val model = Dsir.fit(target, raw, col("text"), buckets = 4096)
    val w = Dsir.scoreDocs(raw, "doc_id", "text", model)
      .select("doc_id", "dsir_logw").as[(Long, Double)].collect().toMap
    val minOn = onTarget.map(d => w(d._1)).min
    val maxOff = offTarget.map(d => w(d._1)).max
    assert(minOn > maxOff,
      s"on-target min $minOn must exceed off-target max $maxOff")
  }

  test("weights are layout-independent") {
    val docs = Tables.load(spark, sfDir, "documents")
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, String] = {
      val m = Dsir.fit(
        df.filter(col("source") === "src0"), df, col("text"), 4096)
      Dsir.scoreDocs(df, "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> String.valueOf(r.get(2))).toMap
    }
    assert(run(docs) == run(docs.repartition(13)),
      "logw sums depend on partitioning")
  }

  test("resample is the deterministic Gumbel-top-k, any layout") {
    val docs = corpus.toDF("doc_id", "text")
    val model = Dsir.fit(
      docs.filter(col("doc_id").isin(targetIds.toSeq: _*)),
      docs, col("text"), buckets = 256)
    val got = Dsir.resample(docs, "doc_id", "text", model, k = 4)
      .select("doc_id").as[Long].collect().toSeq
    def round9(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    val want = naiveWeights(corpus.filter(d => targetIds(d._1)), corpus, 256)
      .toSeq.map { case (id, (_, _, logw)) =>
        (id, round9(logw + gumbel(id)))
      }
      .sortBy { case (id, key) => (-key, id) }
      .take(4).map(_._1)
    assert(got == want, s"draw diverged: $got vs $want")
    val relaid = Dsir.resample(
      docs.repartition(5), "doc_id", "text", model, k = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(relaid == want, "draw depends on partitioning")
  }

  test("the model persists and reloads through the table store") {
    import org.apache.spark.sql.types._
    val docs = corpus.toDF("doc_id", "text")
    val model = Dsir.fit(
      docs.filter(col("doc_id").isin(targetIds.toSeq: _*)),
      docs, col("text"), buckets = 256)
    val store = new graft.streaming.TableStore(
      java.nio.file.Files.createTempDirectory("dsir_store").toString)
    store.overwrite("dsir_ratios", model.ratios)
    val reloaded = Dsir.DsirModel(256,
      store.read(spark, "dsir_ratios", StructType(Seq(
        StructField("bucket", IntegerType),
        StructField("log_ratio", DoubleType)))))
    val direct = Dsir.scoreDocs(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> String.valueOf(r.get(2))).toMap
    val fromStore = Dsir.scoreDocs(docs, "doc_id", "text", reloaded)
      .collect().map(r => r.getLong(0) -> String.valueOf(r.get(2))).toMap
    assert(fromStore == direct, "weights drifted through the store")
  }

  test("the ratio table is bounded by the bucket count") {
    val docs = corpus.toDF("doc_id", "text")
    val model = Dsir.fit(
      docs.filter(col("doc_id").isin(targetIds.toSeq: _*)),
      docs, col("text"), buckets = 256)
    assert(model.ratios.count() == 256L,
      "fit must densify to exactly `buckets` rows — the broadcast " +
        "bound the 100 TB scoring path relies on")
    intercept[IllegalArgumentException] {
      Dsir.fit(docs, docs, col("text"), buckets = 1000)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.PosOps

/** Unit tests per FIXTURES.md §A: tier boundaries, defaults, upsert/
  * anti-join semantics, routing — on hand-built tiny DataFrames.
  */
class PosOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("membership tier boundaries and Bronze default") {
    // boundaries at 100 / 500 / 2000 (reference POS_spark_dag.py:378–384)
    val customers = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d"),
      (5, "e"), (6, "f"), (7, "g"), (8, "no-sales"))
      .toDF("customer_id", "customer_name")
    val sales = Seq(
      (1, 99.99), (2, 100.0), (3, 499.99), (4, 500.0),
      (5, 1999.99), (6, 2000.0), (7, 0.0))
      .toDF("customer_id", "total_price")
    val got = PosOps.membershipLevel(
      customers, sales, "customer_id", col("total_price"), 100, 500, 2000)
      .select("customer_id", "membership_level")
      .as[(Int, String)].collect().toMap
    assert(got == Map(
      1 -> "Bronze", 2 -> "Silver", 3 -> "Silver", 4 -> "Gold",
      5 -> "Gold", 6 -> "Platinum", 7 -> "Bronze", 8 -> "Bronze"))
  }

  test("purchase frequency defaults to 0 for customers with no sales") {
    val customers = Seq((1, "a"), (2, "b")).toDF("customer_id", "name")
    val sales = Seq((1, 10), (1, 11)).toDF("customer_id", "sale_id")
    val got = PosOps.purchaseFrequency(customers, sales, "customer_id", "sale_id")
      .select("customer_id", "purchase_frequency")
      .as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 2L, 2 -> 0L))
  }

  test("deleteSet finds snapshot keys absent from fresh") {
    val snapshot = Seq(1, 2, 3, 4).toDF("k")
    val fresh = Seq(2, 4).toDF("k")
    val got = PosOps.deleteSet(snapshot, fresh, "k").as[Int].collect().sorted
    assert(got.toSeq == Seq(1, 3))
  }

  test("upsert: updates win, unmatched base rows survive") {
    val base = Seq((1, "old1"), (2, "old2"), (3, "old3")).toDF("k", "v")
    val updates = Seq((2, "new2"), (9, "new9")).toDF("k", "v")
    val got = PosOps.upsert(base, updates, "k")
      .as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "old1", 2 -> "new2", 3 -> "old3", 9 -> "new9"))
  }

  test("upsert is idempotent") {
    val base = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val updates = Seq((2, "B")).toDF("k", "v")
    val once = PosOps.upsert(base, updates, "k")
    val twice = PosOps.upsert(once, updates, "k")
    assert(once.as[(Int, String)].collect().toMap ==
      twice.as[(Int, String)].collect().toMap)
  }

  test("category routing: first digit → category, unknown digits → Other") {
    val df = Seq(101, 2345, 7001, 80, 9).toDF("product_id")
    val got = df.select(col("product_id"),
      PosOps.routeCategory(col("product_id")).as("cat"))
      .as[(Int, String)].collect().toMap
    assert(got == Map(101 -> "Daily", 2345 -> "Meat",
      7001 -> "Alcohol", 80 -> "Other", 9 -> "Other"))
  }

  test("cleanLoad drops null rows and exact duplicates") {
    val df = Seq(
      (Some(1), Some("x")), (Some(1), Some("x")),
      (None, Some("y")), (Some(2), None), (Some(3), Some("z")))
      .toDF("id", "v")
    val got = PosOps.cleanLoad(df).as[(Int, String)].collect().toSet
    assert(got == Set((1, "x"), (3, "z")))
  }

  test("cleanLoadWide equals cleanLoad, on both paths") {
    val df = Seq(
      (Some(1), Some("x")), (Some(1), Some("x")),
      (None, Some("y")), (Some(2), None),
      (Some(3), Some("z")), (Some(3), Some("z")), (Some(4), Some("w")))
      .toDF("id", "v")
    val want = PosOps.cleanLoad(df).as[(Int, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    val gotBroadcast = PosOps.cleanLoadWide(df).as[(Int, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    // maxDupKeys = 0 forces the degenerate-input fallback branch
    val gotFallback = PosOps.cleanLoadWide(df, maxDupKeys = 0L)
      .as[(Int, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(gotBroadcast == want)
    assert(gotFallback == want)
  }

  test("cleanLoadWide shuffles a fraction of cleanLoad's bytes on wide rows") {
    import java.util.concurrent.atomic.AtomicLong
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    // 2000 wide (~1 KB) rows, 2% planted exact duplicates — the
    // document-corpus shape where full-row dropDuplicates() ships the
    // whole corpus over the wire. Text must be INCOMPRESSIBLE like real
    // prose: constant filler compresses ~1000x in the lz4 shuffle and
    // hides the full-row cost this test exists to expose
    def randText(seed: Int): String = {
      val r = new scala.util.Random(seed)
      val sb = new StringBuilder
      (0 until 1000).foreach(_ => sb += ('a' + r.nextInt(26)).toChar)
      sb.toString
    }
    val wide = ((1 to 1960).map(i => (i, randText(i))) ++
      (1 to 40).map(i => (5000 + i % 20, randText(100000 + i % 20))))
      .toDF("id", "text")
    val bytes = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          bytes.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    def measure(f: => Long): Long = {
      spark.sparkContext.addSparkListener(listener)
      try {
        bytes.set(0L); f
        org.apache.spark.GraftCoreShims.drainListenerBus(spark.sparkContext)
        bytes.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val fullRows = measure(PosOps.cleanLoad(wide).count())
    val fingerprint = measure(PosOps.cleanLoadWide(wide).count())
    // same answer…
    assert(PosOps.cleanLoadWide(wide).count() == PosOps.cleanLoad(wide).count())
    // …at a fraction of the wire bytes: fingerprints + true dups only
    assert(fingerprint * 3 < fullRows,
      s"expected <1/3 of the full-row shuffle, got $fingerprint vs $fullRows")
    // with dups PRESENT the joins survive AQE and take the broadcast
    // form: uniques pass map-side (anti), dups gather via semi —
    // the dup-free collapse twin is pinned in PlanSpec
    val deduped = PosOps.cleanLoadWide(wide)
    deduped.collect()
    val plan = deduped.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(plan).isDefined,
      s"uniques path lost its broadcast anti-join:\n$plan")
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(plan).isDefined,
      s"duplicate path lost its broadcast semi-join:\n$plan")
  }

  test("stockDecrement subtracts sold qty, 0 for unsold") {
    val products = Seq((1, 100.0), (2, 50.0)).toDF("product_id", "stock")
    val sales = Seq((1, 3.0), (1, 4.0)).toDF("product_id", "qty")
    val got = PosOps.stockDecrement(products, sales,
      "product_id", col("qty"), col("stock"))
      .select("product_id", "stock_after")
      .as[(Int, Double)].collect().toMap
    assert(got == Map(1 -> 93.0, 2 -> 50.0))
  }

  test("topK returns k rows in order") {
    val df = Seq((1, 5.0), (2, 9.0), (3, 7.0), (4, 9.0)).toDF("id", "score")
    val got = PosOps.topK(df, 2, col("score").desc, col("id").asc)
      .as[(Int, Double)].collect().toSeq
    assert(got == Seq((2, 9.0), (4, 9.0)))
  }

  test("decimal money mode classifies the tier boundaries identically") {
    // SURVEY §7.4.6: money as DECIMAL(12,2) is the one-line schema
    // variant for exact-cent deployments; tiering at the {100, 500,
    // 2000} boundaries must agree with double mode, including sums
    // assembled from many cent-sized rows (the FP-drift shape)
    val customers = (1 to 8).map(i => (i, s"c$i")).toDF("cust_id", "name")
    val amounts = Seq(
      (1, Seq(99.99)),            // Bronze: just under
      (2, Seq(100.00)),           // Silver: exactly at
      (3, Seq(499.99)),           // Silver: just under
      (4, Seq(250.00, 250.00)),   // Gold: exactly at, summed
      (5, Seq(1999.99)),          // Gold: just under
      (6, Seq.fill(4)(500.00)),   // Platinum: exactly at, summed
      (7, Seq.fill(10000)(0.01))) // Silver: 10k cent rows sum to 100
    val sales = amounts.flatMap { case (c, as) => as.map(a => (c, a)) }
      .toDF("cust_id", "amount")
    def tiers(amount: org.apache.spark.sql.Column): Map[Int, String] =
      PosOps.membershipLevel(customers, sales, "cust_id",
        amount, 100d, 500d, 2000d)
        .select("cust_id", "membership_level")
        .as[(Int, String)].collect().toMap
    val dbl = tiers(col("amount"))
    val dec = tiers(col("amount").cast("decimal(12,2)"))
    val want = Map(1 -> "Bronze", 2 -> "Silver", 3 -> "Silver",
      4 -> "Gold", 5 -> "Gold", 6 -> "Platinum", 7 -> "Silver",
      8 -> "Bronze") // never purchased: coalesce default
    assert(dec == want, s"decimal mode drifted: $dec")
    assert(dbl == want, s"double mode drifted: $dbl")
  }

  test("saltedJoin equals the plain inner join under a hot key") {
    // 1000 rows of one hot key + a long tail
    val fact = (1 to 1000).map(i => (7, i)) ++ (1 to 50).map(i => (i % 5, -i))
    val factDf = fact.toDF("k", "v")
    val dim = Seq((7, "hot"), (1, "a"), (2, "b"), (3, "c"), (4, "d"), (0, "z"))
      .toDF("k", "name")
    val plain = factDf.join(dim, Seq("k"))
      .select("k", "v", "name").as[(Int, Int, String)].collect().sorted.toSeq
    val salted = PosOps.saltedJoin(factDf, dim, "k", salts = 8)
      .select("k", "v", "name").as[(Int, Int, String)].collect().sorted.toSeq
    assert(salted == plain)
  }
}

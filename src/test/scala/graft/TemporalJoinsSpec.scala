package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.{Sampling, TemporalJoins}

/** As-of join, band join, and deterministic sampling semantics on
  * hand-built frames, plus model checks against brute-force
  * reimplementations on seeded random data.
  */
class TemporalJoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOfJoin attaches the most recent prior right row, inclusive") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"),
      (1L, ts("2024-01-01 09:00:00"), "early"),
      (2L, ts("2024-01-01 10:00:00"), "other-key"),
      (3L, ts("2024-01-01 10:00:00"), "no-right"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 1.0),
      (1L, ts("2024-01-01 12:00:00"), 2.0), // tie with left "b": inclusive
      (1L, ts("2024-01-01 13:00:00"), 3.0), // future: never matches
      (2L, ts("2024-01-01 08:00:00"), 4.0))
      .toDF("k", "rt", "v")
    val got = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "rt")
      .select("tag", "rt", "v").as[(String, Option[Timestamp], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") == ((Some(ts("2024-01-01 09:30:00")), Some(1.0))))
    assert(got("b") == ((Some(ts("2024-01-01 12:00:00")), Some(2.0))))
    assert(got("early") == ((None, None)))
    assert(got("other-key") == ((Some(ts("2024-01-01 08:00:00")), Some(4.0))))
    assert(got("no-right") == ((None, None)))
  }

  test("asOfJoin tolerance nulls matches older than the lookback") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts("2024-01-01 08:00:00"), 7.0))
      .toDF("k", "rt", "v")
    val within = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "rt",
      tolerance = Some(expr("INTERVAL 3 HOUR")))
      .select("v").as[Option[Double]].head()
    val beyond = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "rt",
      tolerance = Some(expr("INTERVAL 1 HOUR")))
      .select("v").as[Option[Double]].head()
    assert(within.contains(7.0))
    assert(beyond.isEmpty)
  }

  test("asOfJoinForward attaches the nearest future right row, inclusive") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"),       // tie with right: inclusive
      (1L, ts("2024-01-01 14:00:00"), "late"),    // nothing after
      (3L, ts("2024-01-01 10:00:00"), "no-right"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), 1.0),
      (1L, ts("2024-01-01 12:00:00"), 2.0),
      (1L, ts("2024-01-01 09:00:00"), 0.5)) // past: never matches forward
      .toDF("k", "rt", "v")
    val got = TemporalJoins.asOfJoinForward(left, right, Seq("k"), "t", "rt")
      .select("tag", "rt", "v").as[(String, Option[Timestamp], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") == ((Some(ts("2024-01-01 11:00:00")), Some(1.0))))
    assert(got("b") == ((Some(ts("2024-01-01 12:00:00")), Some(2.0))))
    assert(got("late") == ((None, None)))
    assert(got("no-right") == ((None, None)))
    // look-ahead tolerance: 30 min excludes the 11:00 match for "a"
    val tol = TemporalJoins.asOfJoinForward(left, right, Seq("k"), "t", "rt",
      tolerance = Some(expr("INTERVAL 30 MINUTE")))
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(tol("a").isEmpty && tol("b").contains(2.0))
  }

  test("null left timestamps never match, in either direction") {
    val left = Seq(
      (1L, Option.empty[Timestamp], "null-ts"),
      (1L, Some(ts("2024-01-01 10:00:00")), "ok"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0))
      .toDF("k", "rt", "v")
    // backward: asc scan puts nulls first — no carry
    val back = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "rt")
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(back("null-ts").isEmpty && back("ok").contains(1.0))
    // forward: desc scan must ALSO put nulls first, or the null-ts row
    // would pick up the key's earliest right row as a bogus match
    val fwd = TemporalJoins.asOfJoinForward(left, right, Seq("k"), "t", "rt")
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(fwd("null-ts").isEmpty && fwd("ok").isEmpty)
    val laterRight = Seq((1L, ts("2024-01-01 11:00:00"), 2.0))
      .toDF("k", "rt", "v")
    val fwd2 = TemporalJoins.asOfJoinForward(left, laterRight, Seq("k"), "t", "rt")
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(fwd2("null-ts").isEmpty && fwd2("ok").contains(2.0))
  }

  test("asOfJoin carry is all-or-nothing: a null field in the latest " +
    "right row must not resurrect an older row's value") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "x"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 11:00:00"), None)) // latest row, null value
      .toDF("k", "rt", "v")
    val got = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "rt")
      .select("rt", "v").as[(Option[Timestamp], Option[Double])].head()
    // the matched row IS (11:00, null) — not the torn pair (11:00, 5.0)
    assert(got == ((Some(ts("2024-01-01 11:00:00")), None)))
    // with tolerance excluding 10:00 but including 11:00, the value
    // must stay null rather than leak the out-of-tolerance 5.0
    val tol = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "rt",
      tolerance = Some(expr("INTERVAL 90 MINUTE")))
      .select("rt", "v").as[(Option[Timestamp], Option[Double])].head()
    assert(tol == ((Some(ts("2024-01-01 11:00:00")), None)))
  }

  test("asOfJoin left row count is preserved (left-join semantics)") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 500).map(i =>
      (rnd.nextInt(10).toLong, new Timestamp(rnd.nextInt(100000).toLong * 1000), i))
      .toDF("k", "t", "id")
    val right = (1 to 300).map(_ =>
      (rnd.nextInt(10).toLong, new Timestamp(rnd.nextInt(100000).toLong * 1000),
        rnd.nextDouble()))
      .toDF("k", "rt", "v")
      .groupBy("k", "rt").agg(max("v").as("v")) // determinism contract
    val out = TemporalJoins.asOfJoin(left, right, Seq("k"), "t", "rt")
    assert(out.count() == 500)
    // model check: expected v = max-v row at the greatest rt <= t
    val rightRows = right.as[(Long, Timestamp, Double)].collect()
    val expected = left.as[(Long, Timestamp, Int)].collect().map {
      case (k, t, id) =>
        val prior = rightRows.filter(r => r._1 == k && !r._2.after(t))
        id -> (if (prior.isEmpty) None
               else Some(prior.maxBy(r => (r._2.getTime, r._3))._3))
    }.toMap
    val got = out.select("id", "v").as[(Int, Option[Double])].collect().toMap
    assert(got == expected)
  }

  test("bandJoin equals the naive non-equi join") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(5).toLong,
        new Timestamp(rnd.nextInt(50000).toLong * 100))) // 0.1s granularity
    val a = rows.toDF("id_a", "k", "ta")
    val b = rows.map { case (i, k, t) => (i, k, t) }.toDF("id_b", "k", "tb")
    val gap = 600L
    val got = TemporalJoins.bandJoin(a, b, Seq("k"), "ta", "tb", gap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      (ia, ka, t1) <- rows; (ib, kb, t2) <- rows
      if ka == kb && t2.getTime > t1.getTime &&
        t2.getTime <= t1.getTime + gap * 1000
    } yield (ia, ib)).toSet
    assert(got == expected)
    assert(got.nonEmpty) // the check must actually exercise matches
  }

  test("bandJoin includes the exact upper boundary, excludes ties") {
    val a = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("id_a", "k", "ta")
    val b = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")),  // tie: excluded (strict >)
      (11L, 1L, ts("2024-01-01 10:10:00")),  // exact gap: included
      (12L, 1L, ts("2024-01-01 10:10:01")))  // beyond: excluded
      .toDF("id_b", "k", "tb")
    val got = TemporalJoins.bandJoin(a, b, Seq("k"), "ta", "tb", 600L)
      .select("id_b").as[Long].collect().toSet
    assert(got == Set(11L))
  }

  test("bandJoin accepts numeric epoch-second time columns") {
    val a = Seq((1L, 1L, 1000.0)).toDF("id_a", "k", "ta")
    val b = Seq(
      (10L, 1L, 1000.0),   // tie: excluded
      (11L, 1L, 1600.0),   // exact gap: included
      (12L, 1L, 1601.0))   // beyond: excluded
      .toDF("id_b", "k", "tb")
    val got = TemporalJoins.bandJoin(a, b, Seq("k"), "ta", "tb", 600L)
      .select("id_b").as[Long].collect().toSet
    assert(got == Set(11L))
    val asLong = TemporalJoins.bandJoin(
      a.withColumn("ta", col("ta").cast("long")),
      b.withColumn("tb", col("tb").cast("long")),
      Seq("k"), "ta", "tb", 600L)
      .select("id_b").as[Long].collect().toSet
    assert(asLong == Set(11L))
  }

  test("intervalOverlapJoin equals the naive overlap join, no duplicates") {
    // numeric intervals spanning MANY bins relative to binWidth=10 —
    // the canonical-bucket rule must still emit each pair exactly once
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, rnd.nextInt(4).toLong, s, s + rnd.nextInt(80).toLong)
    }
    val a = rows.toDF("id_a", "k", "sa", "ea")
    val b = rows.toDF("id_b", "k", "sb", "eb")
    val got = TemporalJoins.intervalOverlapJoin(
        a, b, Seq("k"), "sa", "ea", "sb", "eb", binWidth = 10L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    val expected = (for {
      (ia, ka, s1, e1) <- rows; (ib, kb, s2, e2) <- rows
      if ka == kb && s1 <= e2 && s2 <= e1
    } yield (ia, ib)).toSeq
    assert(got.size == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == expected.toSet)
    assert(got.nonEmpty)
  }

  test("intervalOverlapJoin: closed-interval boundary semantics") {
    val a = Seq((1L, 1L, 100L, 200L)).toDF("id_a", "k", "sa", "ea")
    val b = Seq(
      (10L, 1L, 200L, 300L),  // touches at 200: closed → overlap
      (11L, 1L, 201L, 300L),  // gap of 1: no overlap
      (12L, 1L, 0L, 99L),     // ends just before: no overlap
      (13L, 1L, 0L, 100L),    // touches at 100: overlap
      (14L, 1L, 120L, 180L),  // contained: overlap
      (15L, 2L, 100L, 200L))  // other key: never
      .toDF("id_b", "k", "sb", "eb")
    val got = TemporalJoins.intervalOverlapJoin(
        a, b, Seq("k"), "sa", "ea", "sb", "eb", binWidth = 50L)
      .select("id_b").as[Long].collect().toSet
    assert(got == Set(10L, 13L, 14L))
  }

  test("hashSample is deterministic and rate-proportional") {
    val df = (1 to 20000).toDF("id")
    val s1 = Sampling.hashSample(df, col("id"), 16).as[Int].collect().toSet
    val s2 = Sampling.hashSample(df.repartition(13), col("id"), 16)
      .as[Int].collect().toSet
    assert(s1 == s2) // layout-independent
    assert(math.abs(s1.size - 20000 / 16) < 20000 / 16) // loose binomial bound
    val all = Sampling.hashSample(df, col("id"), 256).count()
    val none = Sampling.hashSample(df, col("id"), 0).count()
    assert(all == 20000 && none == 0)
  }

  test("datasetSplit is exhaustive, exclusive, and layout-independent") {
    import graft.ops.Sampling
    val df = (1 to 20000).toDF("id")
    val bands = Seq(("train", 240), ("val", 8), ("test", 8))
    val got = Sampling.datasetSplit(df, col("id"), bands)
    assert(got.count() == 20000) // every row labeled (exhaustive)
    val byLabel = got.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    // proportions within loose binomial bounds
    assert(byLabel("train") > 17000 && byLabel("val") < 1500)
    // layout-independent: identical assignment after repartition
    val again = Sampling.datasetSplit(df.repartition(17), col("id"), bands)
      .select("id", "split").as[(Int, String)].collect().toMap
    val first = got.select("id", "split").as[(Int, String)].collect().toMap
    assert(first == again)
    // band boundaries agree with hashSample's hex-threshold rule:
    // the train band (byte < 240) is exactly the rate-240 sample
    val trainIds = got.filter(col("split") === "train")
      .select("id").as[Int].collect().toSet
    val sampled = Sampling.hashSample(df, col("id"), 240)
      .select("id").as[Int].collect().toSet
    assert(trainIds == sampled)
    intercept[IllegalArgumentException] {
      Sampling.datasetSplit(df, col("id"), Seq(("a", 100), ("b", 100)))
    }
  }

  test("kFold is exhaustive, near-uniform, and layout-independent") {
    import graft.ops.Sampling
    val df = (1 to 20000).toDF("id")
    val got = Sampling.kFold(df, col("id"), k = 5)
    assert(got.count() == 20000)
    val byFold = got.groupBy("fold").count()
      .as[(Int, Long)].collect().toMap
    assert(byFold.keySet == Set(0, 1, 2, 3, 4), s"folds: ${byFold.keySet}")
    // each fold within loose binomial bounds of 4000
    byFold.values.foreach(n => assert(n > 3600 && n < 4400,
      s"fold sizes skewed: $byFold"))
    val again = Sampling.kFold(df.repartition(17), col("id"), 5)
      .select("id", "fold").as[(Int, Int)].collect().toMap
    assert(got.select("id", "fold").as[(Int, Int)].collect().toMap == again)
    intercept[IllegalArgumentException] { Sampling.kFold(df, col("id"), 1) }
  }

  test("blockedLevenshteinPairs equals brute force within blocks") {
    import graft.ops.FuzzyMatch
    val words = Seq("red widget", "red widgit", "red gadget", "blue bolt",
      "blue boltt", "blue jolt", "green gear", "green gears", "greon gear",
      "tiny cog", "rad widget").zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val df = words.toDF("id", "w")
    val got = FuzzyMatch.blockedLevenshteinPairs(df, "id", "w",
        prefixLen = 2, maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
      .collect().toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      (ia, wa) <- words; (ib, wb) <- words
      if ia < ib && wa.take(2) == wb.take(2) && lev(wa, wb) <= 2
    } yield (ia, ib, lev(wa, wb))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // the documented recall limit: "rad widget" is one edit from
    // "red widget" but blocks under "ra" vs "re", so the pair is missed
    assert(lev("rad widget", "red widget") == 1)
    assert(!got.exists(p => Set(p._1, p._2) == Set(0L, 10L)))
    // the suffix probe recovers it (both end in "et") without
    // duplicating the prefix-found pairs
    val probed = FuzzyMatch.blockedLevenshteinPairs(df, "id", "w",
        prefixLen = 2, maxDist = 2, suffixProbe = true)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
      .collect()
    assert(probed.length == probed.map(p => (p._1, p._2)).distinct.length)
    val probedSet = probed.toSet
    assert(probedSet.contains((0L, 10L, 1)))
    assert(got.subsetOf(probedSet))
  }

  test("NULL sampling keys follow one last-band rule in every sampler") {
    val df = Seq((1, Option("k1")), (2, Option.empty[String]),
      (3, Option("k3"))).toDF("id", "k")
    // partial rates: NULL keys sit in band 255 → dropped, not NULL-ed
    assert(Sampling.hashSample(df, col("k"), 255)
      .filter(col("k").isNull).count() == 0)
    // keep-all keeps them (band 255 < 256)
    assert(Sampling.hashSample(df, col("k"), 256).count() == 3)
    // stratified: same rule per-stratum — NULL-key row survives only
    // where its stratum rate is 256
    val strat = Seq((1, Option("a"), "s1"), (2, Option.empty[String], "s1"),
      (3, Option.empty[String], "s2")).toDF("id", "k", "s")
    val kept = Sampling.stratifiedHashSample(
        strat, col("k"), col("s"), Map("s1" -> 256, "s2" -> 255))
      .select("id").as[Int].collect().toSet
    assert(kept.contains(2) && !kept.contains(3))
    // datasetSplit: NULL key → last band label, deterministically
    val split = Sampling.datasetSplit(df, col("k"),
      Seq(("train", 240), ("val", 8), ("test", 8)))
    assert(split.filter(col("k").isNull).select("split")
      .as[String].collect().toSeq == Seq("test"))
  }

  test("hot-block guard: triangle salt preserves pairs, bounds cells") {
    import graft.ops.FuzzyMatch
    // plant a celebrity prefix: 80 rows share "zz", a handful don't
    val hotWords = (0 until 80).map(i => s"zz item ${i % 7}$i")
    val coldWords = Seq("red widget", "red widgit", "blue bolt")
    val words = (hotWords ++ coldWords).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }
    val df = words.toDF("id", "w")
    def run(maxBlock: Int): Set[(Long, Long, Int)] =
      FuzzyMatch.blockedLevenshteinPairs(df, "id", "w",
          prefixLen = 2, maxDist = 2, maxBlock = maxBlock, salts = 4)
        .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
        .collect().toSet
    val guarded = run(maxBlock = 10)   // "zz" block (80) routed to salt
    val plain = run(maxBlock = 100000) // guard never fires
    assert(guarded == plain)           // recall-free: identical pairs
    assert(guarded.nonEmpty)
    // no duplicate pairs escape the triangle (each unordered pair
    // meets in exactly one cell)
    val rows = FuzzyMatch.blockedLevenshteinPairs(df, "id", "w",
        prefixLen = 2, maxDist = 2, maxBlock = 10, salts = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(rows.length == rows.distinct.length)
    // bounded cells: with the same deterministic group hash the
    // largest group is far under the block size, so per-cell candidate
    // volume is ≤ maxGroup² (vs 80² unguarded)
    val groupSizes = df
      .filter(substring(col("w"), 1, 2) === "zz")
      .groupBy(pmod(xxhash64(col("id")), lit(4L))).count()
      .as[(Long, Long)].collect().toMap
    assert(groupSizes.size == 4)
    val maxGroup = groupSizes.values.max
    assert(maxGroup < 40, s"degenerate salting: maxGroup=$maxGroup")
    assert(maxGroup * maxGroup < 80L * 80L / 2)
  }

  test("stratifiedHashSample applies per-stratum rates consistently") {
    val df = (1 to 9000).map(i => (i, Seq("a", "b", "c")(i % 3)))
      .toDF("id", "s")
    val got = Sampling.stratifiedHashSample(
      df, col("id"), col("s"), Map("a" -> 0, "b" -> 256), defaultRate256 = 32)
    val byStratum = got.groupBy("s").count()
      .as[(String, Long)].collect().toMap
    assert(!byStratum.contains("a"))          // rate 0: dropped
    assert(byStratum("b") == 3000L)           // rate 256: all kept
    assert(byStratum("c") > 150 && byStratum("c") < 600) // ~3000/8
    // stratum members agree with the flat sampler at the same rate
    val flat = Sampling.hashSample(
      df.filter(col("s") === "c"), col("id"), 32)
      .select("id").as[Int].collect().toSet
    val strat = got.filter(col("s") === "c")
      .select("id").as[Int].collect().toSet
    assert(flat == strat)
  }

  test("mixtureSample solves rates that hit the target mixture") {
    // skewed corpus: a=8000, b=1500, c=500 under target 50/25/25 —
    // c binds (500/0.25 = 2000 achievable total), so c keeps whole,
    // a rates 0.5·2000/8000 = 32/256, b rates ⌊256/3⌋ = 85/256
    val df = ((1 to 8000).map(i => (i, "a")) ++
        (8001 to 9500).map(i => (i, "b")) ++
        (9501 to 10000).map(i => (i, "c")))
      .toDF("id", "s")
    val targets = Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25)
    val rates = Sampling.mixtureRates(df, col("s"), targets)
    assert(rates == Map("a" -> 32, "b" -> 85, "c" -> 256))
    val kept = Sampling.mixtureSample(df, col("id"), col("s"), targets)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(kept("c") == 500L)                 // binding stratum whole
    // achieved mixture within hash-sampling noise of 2:1:1
    assert(kept("a") > 700 && kept("a") < 1300)
    assert(kept("b") > 350 && kept("b") < 650)
    // untargeted strata drop entirely
    val withJunk = df.union(Seq((10001, "z"), (10002, "z")).toDF("id", "s"))
    assert(Sampling.mixtureSample(withJunk, col("id"), col("s"), targets)
      .filter(col("s") === "z").count() == 0)
    // layout-independent: identical rows on a repartitioned input
    val again = Sampling
      .mixtureSample(df.repartition(17), col("id"), col("s"), targets)
      .select("id").as[Int].collect().toSet
    val first = Sampling.mixtureSample(df, col("id"), col("s"), targets)
      .select("id").as[Int].collect().toSet
    assert(first == again)
    // unachievable target (stratum absent) → everything rates 0
    val absent = Sampling.mixtureRates(df, col("s"),
      Map("a" -> 0.5, "nope" -> 0.5))
    assert(absent.values.forall(_ == 0))
  }

  test("tokenBudgetSample equals the naive per-stratum prefix window") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    // strata: a partial-keep, b budget ≥ total (whole), c budget 0,
    // d untargeted, zz targeted but absent from the data
    val df = (1 to 3000)
      .map(i => (i.toLong, Seq("a", "b", "c", "d")(i % 4), 1 + rnd.nextInt(20)))
      .toDF("id", "s", "w")
    val budgets = Map("a" -> 2000L, "b" -> 10000000L, "c" -> 0L, "zz" -> 50L)
    val sampled = Sampling.tokenBudgetSample(
      df, col("id"), col("s"), col("w"), budgets)
    val got = sampled.select("id").as[Long].collect().toSet
    // the semantics the DuckDB oracle replays: one prefix window per
    // whole stratum, keep while the exclusive running total < budget
    val wnd = Window.partitionBy("s")
      .orderBy(md5(col("id").cast("string")), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val budgetExpr = budgets.foldLeft(lit(-1L)) { case (els, (st, b)) =>
      when(col("s") === lit(st), lit(b)).otherwise(els)
    }
    val expected = df
      .withColumn("prior", coalesce(sum(col("w")).over(wnd), lit(0L)))
      .filter(col("prior") < budgetExpr)
      .select("id").as[Long].collect().toSet
    assert(got == expected)
    // greedy-until-crossed: kept tokens reach the budget, and removing
    // the last kept doc drops back under it
    val keptA = sampled.filter(col("s") === "a")
      .select("w").as[Int].collect().map(_.toLong)
    assert(keptA.sum >= 2000L && keptA.sum < 2000L + 21L)
    val byStratum = sampled.groupBy("s").count()
      .as[(String, Long)].collect().toMap
    assert(byStratum("b") == 750L)            // budget ≥ total: whole
    assert(!byStratum.contains("c"))          // budget 0: dropped
    assert(!byStratum.contains("d"))          // untargeted: dropped
    // layout-independent: identical rows on a repartitioned input
    val again = Sampling.tokenBudgetSample(
        df.repartition(17), col("id"), col("s"), col("w"), budgets)
      .select("id").as[Long].collect().toSet
    assert(again == got)
  }

  test("tokenMixtureBudgets solves token budgets; binding stratum caps the total") {
    // tokens: a=8000, b=1500, c=500 under target 50/25/25 — c binds
    // (500/0.25 = 2000 achievable), so c keeps every token and the
    // others scale to keep the mixture exact
    val df = ((1 to 100).map(i => (i, "a", 80)) ++
        (101 to 130).map(i => (i, "b", 50)) ++
        (131 to 140).map(i => (i, "c", 50)))
      .toDF("id", "s", "w")
    val targets = Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25)
    val unbounded = Sampling.tokenMixtureBudgets(
      df, col("s"), col("w"), 100000L, targets)
    assert(unbounded == Map("a" -> 1000L, "b" -> 500L, "c" -> 500L))
    // a tighter total budget takes over from the binding stratum
    val capped = Sampling.tokenMixtureBudgets(
      df, col("s"), col("w"), 1000L, targets)
    assert(capped == Map("a" -> 500L, "b" -> 250L, "c" -> 250L))
    // absent targeted stratum binds T to 0 — loud, not renormalized
    val absent = Sampling.tokenMixtureBudgets(
      df, col("s"), col("w"), 1000L, Map("a" -> 0.5, "nope" -> 0.5))
    assert(absent.values.forall(_ == 0L))
    // composition: kept token mass per stratum reaches its budget (to
    // within the crossing document) and the binding stratum is whole
    val kept = Sampling.tokenMixtureSample(
        df, col("id"), col("s"), col("w"), 100000L, targets)
      .groupBy("s").agg(sum(col("w")).as("kt"))
      .as[(String, Long)].collect().toMap
    assert(kept("c") == 500L, s"binding stratum must keep whole: $kept")
    assert(kept("a") >= 1000L && kept("a") < 1080L, s"got $kept")
    assert(kept("b") >= 500L && kept("b") < 550L, s"got $kept")
  }

  test("tokenBudgetSample drops a zero-weight row landing exactly on the budget") {
    // adversarial construction: a zero-weight document whose exclusive
    // prefix sum EQUALS the budget, sitting at the end of a hash band
    // whose cumulative total also equals the budget. The naive window
    // form drops it (prior < budget is strict); a band-keep rule of
    // cum ≤ budget would keep the whole band and diverge.
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val ids = (1L to 200L).toVector
    val order = ids.sortBy(i => (md5hex(i.toString), i))
    val bands = order.groupBy(i => md5hex(i.toString).take(2))
    val band = bands.filter(_._2.size >= 2).keys.min
    val zeroId = bands(band).last // last in hash order within its band
    val budget = order.indexOf(zeroId).toLong // = its exclusive prefix
    val df = ids.map(i => (i, "x", if (i == zeroId) 0 else 1))
      .toDF("id", "s", "w")
    val got = Sampling.tokenBudgetSample(
        df, col("id"), col("s"), col("w"), Map("x" -> budget))
      .select("id").as[Long].collect().toSet
    assert(got == order.take(budget.toInt).toSet)
    assert(!got.contains(zeroId))
  }

  test("temperatureBudgets: α=1 is the natural mixture, α<1 upweights scarce strata") {
    // token mass a=8000, b=1000, c=250 (plus NULL-stratum noise rows,
    // which must not count toward any mass)
    val df = ((1 to 100).map(i => (i, Option("a"), 80)) ++
        (101 to 120).map(i => (i, Option("b"), 50)) ++
        (121 to 125).map(i => (i, Option("c"), 50)) ++
        (126 to 130).map(i => (i, Option.empty[String], 999)))
      .toDF("id", "s", "w")
    // α = 1 with a non-binding total: shares are the natural mixture,
    // every n_k/share_k = N, so T = N and every stratum keeps whole
    val natural = Sampling.temperatureBudgets(
      df, col("s"), col("w"), 1000000L, alpha = 1.0)
    assert(natural == Map("a" -> 8000L, "b" -> 1000L, "c" -> 250L))
    // α = 1 with half the corpus as budget: exact halving
    val halved = Sampling.temperatureBudgets(
      df, col("s"), col("w"), 4625L, alpha = 1.0)
    assert(halved == Map("a" -> 4000L, "b" -> 500L, "c" -> 125L))
    // α = 0.3: the scarcest targeted stratum binds T and keeps whole;
    // scarce strata gain budget SHARE vs natural, rich strata lose
    val smoothed = Sampling.temperatureBudgets(
      df, col("s"), col("w"), 1000000L, alpha = 0.3)
    assert(smoothed("c") == 250L, s"binding stratum must keep whole: $smoothed")
    val total = smoothed.values.sum.toDouble
    assert(smoothed("a") / total < 8000.0 / 9250.0,
      s"rich stratum must lose share: $smoothed")
    assert(smoothed("b") / total > 1000.0 / 9250.0,
      s"scarce stratum must gain share: $smoothed")
    // smoothing is monotone in α: lower α → rich stratum keeps less
    val flatter = Sampling.temperatureBudgets(
      df, col("s"), col("w"), 1000000L, alpha = 0.1)
    assert(flatter("a") < smoothed("a"))
    // guards
    intercept[IllegalArgumentException] {
      Sampling.temperatureBudgets(df, col("s"), col("w"), 1000L, alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureBudgets(df, col("s"), col("w"), 1000L, alpha = 1.5)
    }
    // composition: the sampled output's kept token mass per stratum
    // reaches its solved budget to within the crossing document, and
    // the result is layout-independent
    val kept = Sampling.temperatureMixtureSample(
        df, col("id"), col("s"), col("w"), 2000L, alpha = 0.3)
    val byStratum = kept.groupBy("s").agg(sum(col("w")).as("kt"))
      .as[(String, Long)].collect().toMap
    val budgets = Sampling.temperatureBudgets(
      df, col("s"), col("w"), 2000L, alpha = 0.3)
    budgets.foreach { case (s, b) =>
      // greedy-until-crossed: kept mass reaches the budget and stops
      // within the crossing document (max doc weight here is 80)
      val kt = byStratum.getOrElse(s, 0L)
      assert(kt >= b && kt < b + 81L, s"stratum $s kept $kt vs budget $b")
    }
    val again = Sampling.temperatureMixtureSample(
        df.repartition(17), col("id"), col("s"), col("w"), 2000L, alpha = 0.3)
      .select("id").as[Int].collect().toSet
    assert(again == kept.select("id").as[Int].collect().toSet)
  }

  test("tokenBudgetSample windows only the boundary band") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = (1 to 2000).map(i => (i.toLong, "a", 3)).toDF("id", "s", "w")
    val partial = Sampling.tokenBudgetSample(
      df, col("id"), col("s"), col("w"), Map("a" -> 3000L))
    // ONE window in the whole plan, and the union's kept-whole branch
    // (the bulk of the data) has none — it's a plain scan filter
    val plan = partial.queryExecution.optimizedPlan
    assert(plan.collect { case w: LWindow => w }.size == 1)
    val union = plan.collectFirst {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.get
    assert(union.children.head.collect { case w: LWindow => w }.isEmpty)
    // budget ≥ every stratum total plans NO window at all
    val whole = Sampling.tokenBudgetSample(
      df, col("id"), col("s"), col("w"), Map("a" -> 10000000L))
    assert(whole.queryExecution.optimizedPlan
      .collect { case w: LWindow => w }.isEmpty)
    assert(whole.count() == 2000L)
  }

  test("bestUnderBudget fills best-first and equals the naive quality window") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(13)
    // heavy score ties (10 distinct values), zero weights, NULL scores
    // sprinkled in, and one constant-score stratum (the degenerate
    // single-bucket path); d untargeted
    val df = (1 to 2000).map { i =>
      val s = Seq("a", "b", "c", "d")(i % 4)
      val score: Option[Double] =
        if (i % 17 == 0) None
        else if (s == "c") Some(5.0)
        else Some(rnd.nextInt(10).toDouble)
      (i.toLong, s, rnd.nextInt(20), score)
    }.toDF("id", "s", "w", "score")
    val budgets = Map("a" -> 3000L, "b" -> 10000000L, "c" -> 1000L)
    val got = Sampling.bestUnderBudget(
        df, col("id"), col("s"), col("w"), col("score"), budgets)
      .select("id").as[Long].collect().toSet
    val wnd = Window.partitionBy("s")
      .orderBy(col("score").desc_nulls_last,
        md5(col("id").cast("string")), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val budgetExpr = budgets.foldLeft(lit(-1L)) { case (els, (st, b)) =>
      when(col("s") === lit(st), lit(b)).otherwise(els)
    }
    val expected = df
      .withColumn("prior", coalesce(sum(col("w")).over(wnd), lit(0L)))
      .filter(col("prior") < budgetExpr)
      .select("id").as[Long].collect().toSet
    assert(got == expected)
    // best-first invariant: within a stratum, every kept document
    // scores at least as high as every dropped one
    val aScores = df.filter(col("s") === "a" && col("score").isNotNull)
      .select("id", "score").as[(Long, Double)].collect().toMap
    val (keptA, dropA) = aScores.partition { case (id, _) => got(id) }
    assert(keptA.nonEmpty && dropA.nonEmpty, "budget should split stratum a")
    assert(keptA.values.min >= dropA.values.max)
    // layout-independent
    val again = Sampling.bestUnderBudget(
        df.repartition(17), col("id"), col("s"), col("w"), col("score"),
        budgets)
      .select("id").as[Long].collect().toSet
    assert(again == got)
  }

  test("bestUnderBudget windows only the boundary score band") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = (1 to 2000).map(i => (i.toLong, "a", 3, (i % 7).toDouble))
      .toDF("id", "s", "w", "score")
    val partial = Sampling.bestUnderBudget(
      df, col("id"), col("s"), col("w"), col("score"), Map("a" -> 3000L))
    val plan = partial.queryExecution.optimizedPlan
    assert(plan.collect { case w: LWindow => w }.size == 1)
    val union = plan.collectFirst {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.get
    assert(union.children.head.collect { case w: LWindow => w }.isEmpty)
    // budget above the stratum total: no window anywhere, all kept
    val whole = Sampling.bestUnderBudget(
      df, col("id"), col("s"), col("w"), col("score"),
      Map("a" -> 10000000L))
    assert(whole.queryExecution.optimizedPlan
      .collect { case w: LWindow => w }.isEmpty)
    assert(whole.count() == 2000L)
  }

  test("deterministicShuffle is a stable total order on any layout") {
    val df = (1 to 500).map(i => (i, s"p$i")).toDF("id", "payload")
    val order = Sampling.deterministicShuffle(df, col("id"))
      .select("id").as[Int].collect().toSeq
    // total: a permutation of the input
    assert(order.sorted == (1 to 500))
    // pseudo-random: far from the natural key order
    assert(order != (1 to 500).toSeq && order != (1 to 500).reverse)
    // the driver-side expectation: sort by (md5(id), id)
    val expect = (1 to 500).sortBy { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (h, i)
    }
    assert(order == expect)
    // identical sequence on a different physical layout
    val again = Sampling.deterministicShuffle(df.repartition(17), col("id"))
      .select("id").as[Int].collect().toSeq
    assert(order == again)
  }
}

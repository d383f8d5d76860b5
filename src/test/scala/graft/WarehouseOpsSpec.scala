package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{AggMaintain, DataQuality, Scd, SnapshotDiff, Sketches}

/** Round-8 warehouse-maintenance operators: SCD2 merge, incremental
  * aggregate maintenance, snapshot diff, quarantine routing, and
  * mergeable epoch sketches.
  */
class WarehouseOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def dim(rows: (Long, Double, String)*) =
    rows.toDF("k", "bal", "seg")

  test("scd2: changed key closes + reopens, no-op leaves no churn, new key inserts") {
    val hist = Scd.scd2Init(dim((1L, 10.0, "A"), (2L, 20.0, "B")), lit("t0"))
    val updates = dim((1L, 11.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"))
    val out = Scd.scd2Merge(hist, updates, "k", lit("t1"))
      .select("k", "bal", "seg", "valid_from", "valid_to", "is_current")
      .as[(Long, Double, String, String, Option[String], Boolean)]
      .collect().toSet
    assert(out == Set(
      (1L, 10.0, "A", "t0", Some("t1"), false),  // closed
      (1L, 11.0, "A", "t1", None, true),         // reopened
      (2L, 20.0, "B", "t0", None, true),         // untouched no-op
      (3L, 30.0, "C", "t1", None, true)))        // brand-new key
  }

  test("scd2: a batch with two rows for one key fails loudly") {
    // two open rows per key / fanned-out closed rows would silently
    // corrupt history — there is no ordering column to pick a winner
    val hist = Scd.scd2Init(dim((1L, 10.0, "A")), lit("t0"))
    val updates = dim((1L, 11.0, "A"), (1L, 12.0, "A"))
    val ex = intercept[IllegalArgumentException] {
      Scd.scd2Merge(hist, updates, "k", lit("t1"))
    }
    assert(ex.getMessage.contains("multiple rows per key"))
  }

  test("scd2: null attributes compare null-safely (null→null is a no-op)") {
    val hist = Scd.scd2Init(
      Seq((1L, Option.empty[Double], "A")).toDF("k", "bal", "seg"), lit("t0"))
    val updates = Seq((1L, Option.empty[Double], "A")).toDF("k", "bal", "seg")
    val out = Scd.scd2Merge(hist, updates, "k", lit("t1"))
    assert(out.count() == 1 && out.filter(col("is_current")).count() == 1,
      "identical-with-nulls update must not spawn a churn version")
  }

  test("scd2: two batches layer three versions for a twice-changed key") {
    val h0 = Scd.scd2Init(dim((1L, 1.0, "A")), lit("t0"))
    val h1 = Scd.scd2Merge(h0, dim((1L, 2.0, "A")), "k", lit("t1"))
    val h2 = Scd.scd2Merge(h1, dim((1L, 3.0, "A")), "k", lit("t2"))
    val rows = h2.orderBy("valid_from")
      .select("bal", "valid_from", "valid_to", "is_current")
      .as[(Double, String, Option[String], Boolean)].collect().toSeq
    assert(rows == Seq(
      (1.0, "t0", Some("t1"), false),
      (2.0, "t1", Some("t2"), false),
      (3.0, "t2", None, true)))
    // invariant: exactly one open row per key at every point
    assert(h2.filter(col("is_current")).count() == 1)
  }

  test("scd2: skipDupCheck trusts the caller (guard off, no eager job)") {
    val hist = Scd.scd2Init(dim((1L, 10.0, "A")), lit("t0"))
    // a clean batch merges identically with the guard off
    val out = Scd.scd2Merge(hist, dim((1L, 11.0, "A")), "k", lit("t1"),
      skipDupCheck = true)
    assert(out.filter(col("is_current")).count() == 1)
    assert(out.count() == 2)
  }

  test("scd2: snapshotAt reconstructs the dimension at any past time") {
    val h0 = Scd.scd2Init(dim((1L, 1.0, "A"), (2L, 5.0, "B")), lit("t0"))
    val h1 = Scd.scd2Merge(h0, dim((1L, 2.0, "A")), "k", lit("t2"))
    // string times compare lexicographically: t0 < t1 < t2 < t3
    val at1 = Scd.snapshotAt(h1, lit("t1"))
      .select("k", "bal").as[(Long, Double)].collect().toSet
    val at3 = Scd.snapshotAt(h1, lit("t3"))
      .select("k", "bal").as[(Long, Double)].collect().toSet
    assert(at1 == Set((1L, 1.0), (2L, 5.0)), "pre-change snapshot")
    assert(at3 == Set((1L, 2.0), (2L, 5.0)), "post-change snapshot")
    // boundary: at exactly t2 the NEW version is current ([from, to))
    val at2 = Scd.snapshotAt(h1, lit("t2"))
      .filter($"k" === 1L).select("bal").as[Double].head()
    assert(at2 == 2.0)
  }

  test("scd2: asOfLookup attaches each fact's own-time version") {
    val h0 = Scd.scd2Init(dim((1L, 1.0, "A")), lit("t0"))
    val h1 = Scd.scd2Merge(h0, dim((1L, 2.0, "A")), "k", lit("t2"))
    val facts = Seq(
      (100L, 1L, "s0"), // before any version → nulls (s0 < t0)
      (101L, 1L, "t1"), // first version current
      (102L, 1L, "t2"), // boundary: new version current
      (103L, 1L, "t9"), // open version
      (104L, 7L, "t1")  // unknown key → nulls
    ).toDF("fact_id", "k", "ft")
    val got = Scd.asOfLookup(facts, h1, "k", "ft")
      .select("fact_id", "bal")
      .as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      100L -> None, 101L -> Some(1.0), 102L -> Some(2.0),
      103L -> Some(2.0), 104L -> None))
  }

  test("aggMaintain: folded partials equal one-shot recompute, any fold order") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_returnflag", "l_quantity")
    val parts = (0 to 3).map(i => AggMaintain.partial(
      li.filter(pmod(col("l_orderkey"), lit(4)) === i),
      Seq("l_returnflag"), "l_quantity"))
    val oneShot = AggMaintain.finish(
      AggMaintain.partial(li, Seq("l_returnflag"), "l_quantity"))
    def folded(order: Seq[Int]) = AggMaintain.finish(
      order.map(parts).reduce((a, b) =>
        AggMaintain.merge(a, b, Seq("l_returnflag"))))
    val want = oneShot.collect().toSet
    assert(folded(Seq(0, 1, 2, 3)).collect().toSet == want)
    assert(folded(Seq(3, 1, 0, 2)).collect().toSet == want,
      "merge must be order-invariant (decimal sums, not FP)")
  }

  test("aggMaintain: a delta touching one group leaves other groups' state rows identical") {
    val base = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("g", "v")
    val delta = Seq(("a", 4.0)).toDF("g", "v")
    val s0 = AggMaintain.partial(base, Seq("g"), "v")
    val s1 = AggMaintain.merge(
      s0, AggMaintain.partial(delta, Seq("g"), "v"), Seq("g"))
    val b0 = s0.filter($"g" === "b").collect().toSeq
    val b1 = s1.filter($"g" === "b").collect().toSeq
    assert(b0 == b1, "untouched group state must carry through unchanged")
    val a = AggMaintain.finish(s1).filter($"g" === "a")
      .select("n", "sum_v", "min_v", "max_v", "avg_v")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(a == ((3L, 7.0, 1.0, 4.0, 2.33)))
  }

  test("snapshotDiff classifies insert/delete/update; exact mode agrees") {
    val before = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "z", 3.0))
      .toDF("k", "s", "v")
    val after = Seq((1L, "x", 1.0), (2L, "y", 9.0), (4L, "w", 4.0))
      .toDF("k", "s", "v")
    val want = Set((2L, "update"), (3L, "delete"), (4L, "insert"))
    val hashed = SnapshotDiff.diff(before, after, "k")
      .as[(Long, String)].collect().toSet
    val exact = SnapshotDiff.diff(before, after, "k", exact = true)
      .as[(Long, String)].collect().toSet
    assert(hashed == want && exact == want)
  }

  test("snapshotDiff fingerprint: null vs empty string vs boundary shifts all differ") {
    // the length-prefix rendering must not collide ("ab","c" vs
    // "a","bc") and must keep NULL distinct from ''
    val before = Seq((1L, Some("ab"), Some("c")), (2L, Some(""), Some("")),
      (3L, Option.empty[String], Option.empty[String])).toDF("k", "a", "b")
    val after = Seq((1L, Some("a"), Some("bc")), (2L, Option.empty[String],
      Some("")), (3L, Some(""), Option.empty[String])).toDF("k", "a", "b")
    assert(SnapshotDiff.diff(before, after, "k").count() == 3,
      "all three rows changed under null/boundary-sensitive rendering")
  }

  test("quarantine: first-match rule order, null fails, outputs partition input") {
    val df = Seq(
      (1L, Some(5.0), Some(1.0)),   // clean
      (2L, Some(-1.0), Some(-1.0)), // fails r1 (and r2; r1 tag wins)
      (3L, Some(5.0), Some(-1.0)),  // fails r2
      (4L, Option.empty[Double], Some(1.0))) // null → fails r1
      .toDF("k", "x", "y")
    val (clean, quar) = DataQuality.quarantine(df, Seq(
      "x_pos" -> (col("x") > 0), "y_pos" -> (col("y") > 0)))
    assert(clean.select("k").as[Long].collect().toSet == Set(1L))
    assert(quar.select("k", "failed_rule").as[(Long, String)].collect().toSet
      == Set((2L, "x_pos"), (3L, "y_pos"), (4L, "x_pos")))
    assert(clean.count() + quar.count() == df.count())
    assert(clean.columns.sameElements(df.columns),
      "clean output keeps the input schema (no tag column)")
  }

  test("kAnonymity flags exactly the under-k groups; empty = anonymous") {
    val rows = Seq.fill(10)(("SEG1", 1)) ++ Seq.fill(3)(("SEG1", 2)) ++
      Seq.fill(1)(("SEG2", 1))
    val df = rows.toDF("seg", "nat")
    val got = DataQuality.kAnonymityViolations(df, Seq("seg", "nat"), 5L)
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(("SEG1", 2, 3L), ("SEG2", 1, 1L)))
    assert(DataQuality.kAnonymityViolations(df, Seq("seg", "nat"), 2L)
      .filter($"seg" === "SEG1" && $"nat" === 1).isEmpty)
    // nulls group together (as identifying as any shared value)
    val withNull = (rows ++ Seq((null, 1), (null, 1))).toDF("seg", "nat")
    val nullGroup = DataQuality
      .kAnonymityViolations(withNull, Seq("seg", "nat"), 5L)
      .filter($"seg".isNull).as[(String, Int, Long)].collect().toSeq
    assert(nullGroup == Seq((null, 1, 2L)))
  }

  test("lDiversity flags homogeneous groups regardless of their size") {
    val df = (Seq.fill(20)(("A", "flu")) ++                 // big but uniform
      Seq(("B", "flu"), ("B", "cold"), ("B", "covid"))      // small, diverse
      ).toDF("zip", "diagnosis")
    val got = DataQuality
      .lDiversityViolations(df, Seq("zip"), "diagnosis", 2L)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("A", 20L, 1L)),
      s"homogeneity attack not flagged: $got")
  }

  test("epoch sketches merge to the whole-corpus estimate") {
    val ev = (1 to 2000).map(i => (s"day${i % 7}", s"user${i % 311}"))
      .toDF("day", "uid")
    val sk = Sketches.epochSketches(ev, col("day"), col("uid"))
    assert(sk.count() == 7)
    val (est, n) = Sketches.mergeEstimate(sk)
      .as[(Long, Long)].head()
    assert(n == 2000)
    assert(math.abs(est - 311L) <= math.ceil(311 * 0.05).toLong,
      s"merged estimate $est outside 5% of 311")
    // merging a SUBSET of epochs estimates that subset only
    val (est2, _) = Sketches.mergeEstimate(sk.filter($"epoch" === "day0"))
      .as[(Long, Long)].head()
    val exact0 = ev.filter($"day" === "day0").select("uid").distinct().count()
    assert(math.abs(est2 - exact0) <= math.ceil(exact0 * 0.05).toLong)
  }
}

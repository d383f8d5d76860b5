package graft

import org.apache.spark.sql.functions._

import graft.ops.Stats

class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("weightedQuantiles: inclusive cumulative-weight definition") {
    // group a: (v,w) = (1,1)(2,2)(3,3)(4,4), tot=10
    //   p25 → thresh 2.5 → v=2 (cum 3); p50 → 5 → v=3 (cum 6);
    //   p90 → 9 → v=4 (cum 10); p100 → 10 → v=4
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 4L),
      // group b: duplicated value rows must merge before the cum pass
      ("b", 5L, 1L), ("b", 5L, 1L), ("b", 7L, 2L))
      .toDF("g", "v", "w")
    val got = Stats.weightedQuantiles(
      df, col("g"), col("v"), col("w"), Seq(25, 50, 90, 100))
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(
      ("a", 25, 2L), ("a", 50, 3L), ("a", 90, 4L), ("a", 100, 4L),
      ("b", 25, 5L), ("b", 50, 5L), ("b", 90, 7L), ("b", 100, 7L)))
  }

  test("weightedQuantiles: layout-independent") {
    val df = (1 to 500)
      .map(i => (s"g${i % 3}", (i * 37 % 101).toLong, (i % 7 + 1).toLong))
      .toDF("g", "v", "w")
    val q = Seq(10, 50, 95)
    val a = Stats.weightedQuantiles(df, col("g"), col("v"), col("w"), q)
      .as[(String, Int, Long)].collect().toSet
    val b = Stats.weightedQuantiles(
      df.repartition(11), col("g"), col("v"), col("w"), q)
      .as[(String, Int, Long)].collect().toSet
    assert(a == b && a.size == 9)
  }

  test("weightedQuantiles: band count never changes the result") {
    // banding is execution partitioning only — bands=1 (one band =
    // the un-banded algorithm), a band width that lands percentile
    // thresholds exactly on band edges, and the default must all pick
    // identical rows; values are clustered so some bands are empty
    val df = (1 to 800)
      .map { i =>
        val v = if (i % 3 == 0) (i % 13).toLong      // dense cluster
                else 1000000L + (i * 997 % 4001)      // far cluster
        (s"g${i % 2}", v, (i % 5 + 1).toLong)
      }
      .toDF("g", "v", "w")
    val q = Seq(1, 25, 50, 75, 99, 100)
    val expect = Stats
      .weightedQuantiles(df, col("g"), col("v"), col("w"), q, bands = 1)
      .as[(String, Int, Long)].collect().toSet
    for (b <- Seq(2, 7, 4096)) {
      val got = Stats
        .weightedQuantiles(df, col("g"), col("v"), col("w"), q, bands = b)
        .as[(String, Int, Long)].collect().toSet
      assert(got == expect, s"bands=$b diverged")
    }
    assert(expect.size == 12)
  }

  test("weightedQuantiles: null values are excluded, SQL-style") {
    // a null value must not create a NULLS-FIRST band that shifts
    // every cumulative offset — quantiles over (1,2,3) with a null
    // row mixed in are identical to quantiles without it
    val df = Seq(("a", Some(1L), 1L), ("a", None, 7L),
      ("a", Some(2L), 1L), ("a", Some(3L), 1L)).toDF("g", "v", "w")
    val got = Stats
      .weightedQuantiles(df, col("g"), col("v"), col("w"), Seq(50, 100))
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(("a", 50, 2L), ("a", 100, 3L)))
    // same exclusion in the domain-checkpointing consumers
    val mad = Stats.madOutliers(df, col("g"), col("v"))
      .as[(String, Long, Long, Long, Long)].head()
    assert(mad == (("a", 2L, 1L, 3L, 0L)))
  }

  test("weightedQuantiles: single-value group and zero total weight") {
    // degenerate bands: range 0 → one band; all-zero weights → every
    // threshold is 0 and the inclusive rule returns the minimum value
    val df = Seq(("a", 7L, 3L), ("a", 7L, 2L),
      ("z", 1L, 0L), ("z", 9L, 0L)).toDF("g", "v", "w")
    val got = Stats
      .weightedQuantiles(df, col("g"), col("v"), col("w"), Seq(50, 100))
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(("a", 50, 7L), ("a", 100, 7L),
      ("z", 50, 1L), ("z", 100, 1L)))
  }

  test("madOutliers: hand-checked medians, MAD and fence counts") {
    // group a values: 1,2,3,4,100 → median 3 (2·cum>=5 first at 3),
    // deviations 2,1,0,1,97 → MAD 1, fence 3·1=3 → outlier: 100 only
    val a = Seq(1L, 2L, 3L, 4L, 100L).map(("a", _))
    // group z: 5,5,5,9 → median 5, dev 0,0,0,4 → MAD 0 → any v≠5 out
    val z = Seq(5L, 5L, 5L, 9L).map(("z", _))
    val got = Stats.madOutliers(
        (a ++ z).toDF("g", "v"), col("g"), col("v"), k = 3)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 3L, 1L, 5L, 1L), ("z", 5L, 0L, 4L, 1L)))
  }

  test("madOutliers: layout-independent") {
    val df = (1 to 500)
      .map(i => (s"g${i % 3}", ((i * 131) % 997).toLong))
      .toDF("g", "v")
    val x = Stats.madOutliers(df, col("g"), col("v"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val y = Stats.madOutliers(df.repartition(13), col("g"), col("v"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(x == y && x.size == 3)
  }

  test("paretoTopShare: hand-checked 80/20 prefix") {
    // group s entity values desc: 50,30,10,10 → T=100, th=80:
    // 50+30=80 reaches at vstar=30 → n_top=2 of 4 → 5000 bp
    val s = Seq(50L, 30L, 10L, 10L).map(("s", _))
    // group u: 7,1,1,1 → T=10, th=8: above(v>1)=7 < 8, vstar=1,
    // k=ceil((8-7)/1)=1 → n_top=2 of 4 → 5000 bp
    val u = Seq(7L, 1L, 1L, 1L).map(("u", _))
    val got = Stats.paretoTopShare(
        (s ++ u).toDF("g", "v"), col("g"), col("v"), pct = 80)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("s", 4L, 2L, 5000L, 30L), ("u", 4L, 2L, 5000L, 1L)))
  }

  test("paretoTopShare: boundary-tie entities count by ceil division") {
    // values 10,10,10,10,10 → T=50, th=40 → vstar=10, above=0,
    // k=ceil(40/10)=4 → n_top=4 of 5 → 8000 bp
    val df = Seq.fill(5)(("t", 10L)).toDF("g", "v")
    val got = Stats.paretoTopShare(df, col("g"), col("v"), pct = 80)
      .as[(String, Long, Long, Long, Long)].head()
    assert(got == (("t", 5L, 4L, 8000L, 10L)))
  }

  test("theil: 0 for perfect equality; ln(n) for one-holder; 0·ln0=0") {
    // equal values → every ln(v·n/S) = ln(1) = 0
    val eq = Seq.fill(4)(("e", 5L)).toDF("g", "v")
    val t0 = Stats.theil(eq, col("g"), col("v"))
      .as[(String, Long, Long)].head()
    assert(t0 == (("e", 4L, 0L)))
    // one holder of everything: T = ln(n) = ln(4) = 1.386294361 (9dp);
    // the three zero rows contribute 0 by the convention
    val one = (Seq(("o", 12L)) ++ Seq.fill(3)(("o", 0L))).toDF("g", "v")
    val t1 = Stats.theil(one, col("g"), col("v"))
      .as[(String, Long, Long)].head()
    assert(t1 == (("o", 4L, 1386294361L)))
  }

  test("theil: layout-independent") {
    val df = (1 to 400)
      .map(i => (s"g${i % 2}", ((i * 131) % 997).toLong))
      .toDF("g", "v")
    val a = Stats.theil(df, col("g"), col("v"))
      .as[(String, Long, Long)].collect().toSet
    val b = Stats.theil(df.repartition(11), col("g"), col("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(a == b && a.size == 2)
  }

  test("winsorizedMean: clamps exactly to the inclusive thresholds") {
    // 1..10 with one huge outlier replacing 10: p25/p75 of
    // 1,2,...,9,1000 → lo: first 100·cw >= 25·10 → cw>=2.5 → v=3;
    // hi: 100·cw >= 75·10 → cw>=7.5 → v=8
    // clamped: 3,3,3,4,5,6,7,8,8,8 → sum 55, mean 5.5 → 5_500_000
    val df = ((1L to 9L) :+ 1000L).map(("w", _)).toDF("g", "v")
    val got = Stats.winsorizedMean(
        df, col("g"), col("v"), pLo = 25, pHi = 75)
      .as[(String, Long, Long, Long, Long)].head()
    assert(got == (("w", 3L, 8L, 10L, 5500000L)))
  }

  test("globalRowNumber: a dense permutation matching the total order") {
    val df = (1 to 300).map(i => ((i * 7919) % 1000, i)).toDF("k", "id")
    val (ranked, release) =
      Stats.globalRowNumber(df, Seq(col("k"), col("id")), "rn")
    try {
      val rows = ranked.select("k", "id", "rn")
        .as[(Int, Int, Long)].collect().sortBy(_._3)
      assert(rows.map(_._3).toSeq == (1L to 300L))
      // rank order IS the (k, id) sort order
      assert(rows.map(r => (r._1, r._2)).toSeq ==
        rows.map(r => (r._1, r._2)).sortBy(identity).toSeq)
    } finally release()
  }

  test("gini: 0 for perfect equality, (n-1)/n for one-holder") {
    val eq = Seq(("s", 1L, 5L), ("s", 2L, 5L), ("s", 3L, 5L),
      ("s", 4L, 5L)).toDF("g", "k", "x")
    val g0 = Stats.gini(eq, col("g"), col("k"), col("x"))
      .as[(String, Long, Double)].head()
    assert(g0 == (("s", 4L, 0.0)))
    val one = Seq(("s", 1L, 0L), ("s", 2L, 0L), ("s", 3L, 0L),
      ("s", 4L, 10L)).toDF("g", "k", "x")
    val g1 = Stats.gini(one, col("g"), col("k"), col("x"))
      .as[(String, Long, Double)].head()
    assert(g1 == (("s", 4L, 0.75)))
  }

  test("gini: layout-independent across partitionings") {
    val df = (1 to 400)
      .map(i => (s"g${i % 2}", i.toLong, ((i * 131) % 997).toLong))
      .toDF("g", "k", "x")
    val a = Stats.gini(df, col("g"), col("k"), col("x"))
      .as[(String, Long, Double)].collect().toSet
    val b = Stats.gini(df.repartition(17), col("g"), col("k"), col("x"))
      .as[(String, Long, Double)].collect().toSet
    assert(a == b && a.size == 2)
  }

  test("benford: digit histogram + pinned expected shares") {
    val df = Seq(10L, 12L, 19L, 2L, 25L, 3L, 35L, 9L, 91L, 100L,
      0L, -7L) // zero/negative excluded
      .toDF("v")
    val got = Stats.benford(df, col("v"))
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1) == ((4L, 40.0, 30.103)))
    assert(got(2) == ((2L, 20.0, 17.609126)))
    assert(got(3) == ((2L, 20.0, 12.493874)))
    assert(got(9) == ((2L, 20.0, 4.575749)))
    assert(got.size == 4)
  }

  test("acf: alternating series has lag-1 autocorrelation -1") {
    val s = Seq(("d1", 1L), ("d2", 2L), ("d3", 1L), ("d4", 2L),
      ("d5", 1L), ("d6", 2L)).toDF("b", "x")
    val got = Stats.acf(s, col("b"), col("x"), maxLag = 2)
      .as[(Int, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1) == ((1, 5L, -1.0)))
    assert(got(2) == ((2, 4L, 1.0)))
  }

  test("cusum: level shift found at the step, exact means") {
    val s = Seq(("d1", 10L), ("d2", 10L), ("d3", 10L),
      ("d4", 20L), ("d5", 20L), ("d6", 20L)).toDF("b", "x")
    val got = Stats.cusumChangepoint(s, col("b"), col("x"))
      .as[(String, Long, Double, Double, Option[Double])].head()
    // d_t = |6*S_t - t*90| peaks at t=3 (|180-270| = 90)
    assert(got == (("d3", 6L, 90.0, 10.0, Some(20.0))))
  }

  test("cusum: ties break earliest; single bucket leaves mean_after null") {
    val s = Seq(("d1", 5L), ("d2", 5L)).toDF("b", "x")
    val got = Stats.cusumChangepoint(s, col("b"), col("x"))
      .as[(String, Long, Double, Double, Option[Double])].head()
    // constant series: every d_t = 0, tie breaks to the EARLIEST
    assert(got == (("d1", 2L, 0.0, 5.0, Some(5.0))))
    val one = Seq(("d1", 7L)).toDF("b", "x")
    val g1 = Stats.cusumChangepoint(one, col("b"), col("x"))
      .as[(String, Long, Double, Double, Option[Double])].head()
    // t = n at the only bucket: no after-segment to average
    assert(g1 == (("d1", 1L, 0.0, 7.0, None)))
  }
}

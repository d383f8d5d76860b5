package graft

import graft.ops.RankEval

class RankEvalSpec extends SparkTestBase {
  import spark.implicits._

  test("metrics match a hand-run nDCG/MRR/P/R at k=3") {
    // qA: rel at ranks 1 and 3 of 4 total relevant
    //   dcg = 1/log2(2) + 1/log2(4) = 1 + 0.5; idcg(k=3, n_rel>=3)
    //   = 1 + 1/log2(3) + 0.5 ; mrr = 1; p = 2/3; r = 2/4
    // qB: nothing relevant retrieved, 2 relevant exist
    // qC: no relevant documents at all -> all-zero row
    val ranking = Seq(
      ("qA", 10L, 1), ("qA", 11L, 2), ("qA", 12L, 3),
      ("qB", 20L, 1), ("qB", 21L, 2), ("qB", 22L, 3),
      ("qC", 30L, 1), ("qC", 31L, 2), ("qC", 32L, 3))
      .toDF("qid", "doc_id", "rank")
    val qrels = Seq(
      ("qA", 10L), ("qA", 12L), ("qA", 90L), ("qA", 91L),
      ("qB", 95L), ("qB", 96L))
      .toDF("qid", "doc_id")
    val got = RankEval.rankingMetrics(ranking, qrels, 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    val u = RankEval.dcgUnits(3)
    val ndcgA = math.rint((u(0) + u(2)).toDouble /
      (u(0) + u(1) + u(2)).toDouble * 1e6) / 1e6
    assert(got("qA") == ((4L, 2L, 1, ndcgA, 1.0, 0.666667, 0.5)))
    assert(got("qB") == ((2L, 0L, 0, 0.0, 0.0, 0.0, 0.0)))
    assert(got("qC") == ((0L, 0L, 0, 0.0, 0.0, 0.0, 0.0)))
    // sanity on the closed form: ndcgA ~ (1 + .5)/(1 + 0.63093 + .5)
    assert(math.abs(ndcgA - 1.5 / 2.13093) < 1e-4)
  }

  test("unit table is the metric constant it claims") {
    val u = RankEval.dcgUnits(4)
    assert(u(0) == 1000000000000L)               // 1/log2(2) = 1
    assert(u(3) == Math.round(1e12 / math.log(5.0) * math.log(2.0)))
    assert(u == RankEval.dcgUnits(4), "must be deterministic")
  }

  test("confusion: hand-checked counts and integer-bp metrics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // tp=3 fp=1 fn=2 tn=4: precision 3/4=7500, recall 3/5=6000,
    // f1 = 6/(6+1+2) = 6666 (floor)
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(1)((false, true)) ++
      Seq.fill(2)((true, false)) ++ Seq.fill(4)((false, false))
    val got = graft.ops.RankEval.confusion(
        rows.toDF("t", "p"), col("t"), col("p"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got == ((3L, 1L, 2L, 4L, 7500L, 6000L, 6666L)))
    // degenerate: classifier never fires -> precision 0, not null
    val none = Seq((true, false), (false, false)).toDF("t", "p")
    val g2 = graft.ops.RankEval.confusion(none, col("t"), col("p"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(g2 == ((0L, 0L, 1L, 1L, 0L, 0L, 0L)))
  }
}

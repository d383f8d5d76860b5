package graft

import graft.ops.Fusion

class FusionSpec extends SparkTestBase {
  import spark.implicits._

  test("RRF fuses two rankings with exact hand-computed scores") {
    // system A: 10, 20, 30 — system B: 20, 10, 40.
    // id 10 and 20 both score round(1/61,9)+round(1/62,9) =
    // 0.032522475 (a true tie → id asc breaks it); 30 and 40 both
    // score round(1/63,9) = 0.015873016 (same).
    val a = Seq(("q1", 10L, 1), ("q1", 20L, 2), ("q1", 30L, 3))
      .toDF("qid", "id", "rank")
    val b = Seq(("q1", 20L, 1), ("q1", 10L, 2), ("q1", 40L, 3))
      .toDF("qid", "id", "rank")
    val got = Fusion.reciprocalRankFusion(Seq(a, b), "qid", "id", "rank")
      .orderBy("rank")
      .as[(String, Int, Long, Double, Long)].collect().toSeq
    assert(got == Seq(
      ("q1", 1, 10L, 0.032522475, 2L),
      ("q1", 2, 20L, 0.032522475, 2L),
      ("q1", 3, 30L, 0.015873016, 1L),
      ("q1", 4, 40L, 0.015873016, 1L)))
  }

  test("single-system fusion preserves the input order; topK truncates") {
    val a = Seq(("q1", 7L, 1), ("q1", 5L, 2), ("q1", 9L, 3),
      ("q2", 1L, 1)).toDF("qid", "id", "rank")
    val got = Fusion.reciprocalRankFusion(Seq(a), "qid", "id", "rank",
        topK = 2)
      .select("qid", "rank", "id")
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(
      ("q1", 1, 7L), ("q1", 2, 5L), ("q2", 1, 1L)))
  }

  test("MMR greedy selection on a hand-checked geometry") {
    // λ=0.5 and dyadic rels keep every IEEE product/difference exact:
    // id1 rel 1.0 picked first (score 0.5); id2 duplicates id1's
    // direction (sim 1.0 → mmr −0.125) so the orthogonal id3 (0.25)
    // and the VECTORLESS id4 (sim coalesces to 0 → 0.125) both beat
    // it; the redundant duplicate sinks to last despite rel 0.75.
    val cand = Seq(("q1", 1L, 1.0), ("q1", 2L, 0.75), ("q1", 3L, 0.5),
      ("q1", 4L, 0.25)).toDF("qid", "id", "rel")
    val vecs = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (3L, Seq(0.0, 1.0))).toDF("id", "vector")
    val got = graft.ops.Fusion.mmrRerank(cand, vecs, lambda = 0.5, k = 4)
    val rows = got.orderBy("rank")
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(rows == Seq(
      ("q1", 1, 1L, 0.5),
      ("q1", 2, 3L, 0.25),
      ("q1", 3, 4L, 0.125),
      ("q1", 4, 2L, -0.125)))
  }

  test("fusion is layout-independent") {
    val a = (1 to 50).map(i => ("q1", (i * 7 % 100).toLong, i))
      .toDF("qid", "id", "rank")
    val b = (1 to 50).map(i => ("q1", (i * 13 % 100).toLong, i))
      .toDF("qid", "id", "rank")
    val x = Fusion.reciprocalRankFusion(Seq(a, b), "qid", "id", "rank",
        topK = 30)
      .as[(String, Int, Long, Double, Long)].collect().toSet
    val y = Fusion.reciprocalRankFusion(
        Seq(a.repartition(7), b.repartition(3)), "qid", "id", "rank",
        topK = 30)
      .as[(String, Int, Long, Double, Long)].collect().toSet
    assert(x == y, "RRF depends on layout")
  }
}

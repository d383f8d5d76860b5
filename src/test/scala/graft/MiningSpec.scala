package graft

import graft.similarity.Mining

class MiningSpec extends SparkTestBase {
  import spark.implicits._

  test("hard negatives exclude positives BEFORE ranking") {
    // query 100 = (1,0); positives 1 and 2 are the two NEAREST
    // vectors — an exclude-after-top-2 would return nothing, the
    // correct exclude-before returns the next-best non-positives
    val queries = Seq((100L, Seq(1.0, 0.0))).toDF("query_id", "vector")
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)),    // positive, cos 1.0
      (2L, Seq(0.99, 0.01)),  // positive, cos ~1.0
      (3L, Seq(0.8, 0.6)),    // negative, cos 0.8
      (4L, Seq(0.0, 1.0)),    // negative, cos 0.0
      (5L, Seq(0.0, 0.0))     // zero norm — dropped
    ).toDF("vec_id", "vector")
    val pos = Seq((100L, 1L), (100L, 2L)).toDF("query_id", "vec_id")
    val got = Mining.hardNegatives(queries, corpus, pos, 2)
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    assert(got == Seq((100L, 1, 3L, 0.8), (100L, 2, 4L, 0.0)))
  }

  test("hardNegativesFrom ranks a precomputed candidate set") {
    val cands = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.8), (1L, 13L, 0.1))
      .toDF("query_id", "vec_id", "score")
    val pos = Seq((1L, 10L)).toDF("query_id", "vec_id")
    val got = Mining.hardNegativesFrom(cands, pos, 2)
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    // score tie 0.8/0.8 breaks toward the smaller vec_id
    assert(got == Seq((1L, 1, 11L, 0.8), (1L, 2, 12L, 0.8)))
  }
}

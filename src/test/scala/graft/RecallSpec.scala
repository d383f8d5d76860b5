package graft

/** Enforces the RECALL.json floors in the test suite: a recall
  * regression in any approximate path fails `sbt test` the same way a
  * wrong exact answer would (graft.Recall.main is the other enforcing
  * entry point; Verify only records and shouts).
  */
class RecallSpec extends SparkTestBase {

  test("every approximate query clears its recall floor at sf0.01") {
    val ms = Recall.metrics(spark, "/root/testdata/sf0.01")
    assert(ms.nonEmpty)
    val failed = ms.filter(!_.pass)
    assert(failed.isEmpty, "floors violated: " +
      failed.map(m => f"${m.query} recall=${m.recall}%.4f < ${m.recallFloor}")
        .mkString("; "))
    spark.catalog.clearCache()
  }
}

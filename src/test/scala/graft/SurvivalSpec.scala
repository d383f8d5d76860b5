package graft

import org.apache.spark.sql.functions._

import graft.ops.Survival

class SurvivalSpec extends SparkTestBase {
  import spark.implicits._

  test("kaplanMeier: the textbook curve — events, ties, censoring") {
    // durations: 6,6 events + 6 censored; 7 event; 10 censored
    val subj = Seq((6L, true), (6L, true), (6L, false),
      (7L, true), (10L, false)).toDF("t", "obs")
    val got = Survival.kaplanMeier(subj, col("t"), col("obs"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // S(6) = 1 - 2/5 = 0.6; S(7) = 0.6 * (1 - 1/2) = 0.3;
    // t=10 has no event -> no output row
    assert(got.toSeq == Seq((6L, 5L, 2L, 0.6), (7L, 2L, 1L, 0.3)))
  }

  test("kaplanMeier: censoring shrinks the risk set without a step") {
    val subj = Seq((1L, true), (2L, false), (3L, true))
      .toDF("t", "obs")
    val got = Survival.kaplanMeier(subj, col("t"), col("obs"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // S(1) = 2/3; at t=3 the lone remaining subject converts: d =
    // n_risk -> exact 0, never ln(0)
    assert(got.toSeq == Seq((1L, 3L, 1L, 0.666667), (3L, 1L, 1L, 0.0)))
  }

  test("kaplanMeier: layout-independent") {
    val subj = (1 to 500)
      .map(i => (((i * 37) % 60).toLong, i % 3 != 0))
      .toDF("t", "obs")
    val a = Survival.kaplanMeier(subj, col("t"), col("obs"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = Survival.kaplanMeier(
      subj.repartition(11), col("t"), col("obs"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.Anomaly

class AnomalySpec extends SparkTestBase {
  import spark.implicits._

  test("a spike day is flagged; normal days are not") {
    val series = Seq(
      ("d1", 100L), ("d2", 105L), ("d3", 98L), ("d4", 102L),
      ("d5", 990L), // bot flood
      ("d6", 101L), ("d7", 97L))
      .toDF("day", "n")
    val got = Anomaly.robustOutliers(series, "n", k = 3L)
      .select("day", "median", "mad", "is_anomaly")
      .as[(String, Long, Long, Boolean)].collect()
    // sorted values: 97,98,100,101,102,105,990 → lower median 101
    // deviations sorted: 0,1,1,3,4,4,889 → MAD 3
    assert(got.forall(r => r._2 == 101L && r._3 == 3L))
    val flagged = got.filter(_._4).map(_._1).toSet
    assert(flagged == Set("d5"), s"flagged: $flagged")
  }

  test("even-length series takes the LOWER median (stays integral)") {
    val series = Seq(("a", 10L), ("b", 20L), ("c", 30L), ("d", 40L))
      .toDF("k", "n")
    val med = Anomaly.robustOutliers(series, "n")
      .select("median").as[Long].head()
    assert(med == 20L)
  }

  test("MAD = 0 (constant series) flags every deviating point") {
    val series = Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 6L))
      .toDF("k", "n")
    val got = Anomaly.robustOutliers(series, "n")
      .select("k", "is_anomaly").as[(String, Boolean)].collect().toMap
    assert(got == Map("a" -> false, "b" -> false, "c" -> false,
      "d" -> true))
  }

  test("flags are layout-independent") {
    val series = (1 to 60).map(i =>
      (s"d$i", if (i == 17) 5000L else 100L + i % 7)).toDF("day", "n")
    val a = Anomaly.robustOutliers(series, "n")
      .select("day", "is_anomaly").as[(String, Boolean)].collect().toMap
    val b = Anomaly.robustOutliers(series.repartition(13), "n")
      .select("day", "is_anomaly").as[(String, Boolean)].collect().toMap
    assert(a == b)
    assert(a.count(_._2) == 1 && a("d17"))
  }
}

package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Inline data-quality instrumentation: observe() rides metric
  * aggregates on the SAME pass as the real work — no second scan —
  * which is how a pipeline gates a load on quality counters at 100 TB
  * (DataQuality.nullProfile is the standalone profiling pass; this is
  * the zero-extra-cost in-flight form).
  */
class ObservationSpec extends SparkTestBase {
  import spark.implicits._

  test("nullProfile counts actual nulls and null-excluding distincts") {
    import graft.ops.DataQuality
    val df = Seq(
      (Some(1L), Some("a")), (None, Some("a")),
      (Some(2L), None), (Some(2L), Some("b")), (None, None))
      .toDF("k", "s")
    val got = DataQuality.nullProfile(df)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // countDistinct excludes nulls (SQL semantics) — n_nulls carries
    // the null story separately
    assert(got("k") == ((5L, 2L, 2L)))
    assert(got("s") == ((5L, 2L, 2L)))
    // dotted column names resolve as literal names, not struct paths
    val dotted = DataQuality.nullProfile(
        df.withColumnRenamed("k", "props.version"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(dotted("props.version") == ((5L, 2L, 2L)))
  }

  test("gate passes clean loads and rejects breaches with counts") {
    import graft.ops.DataQuality
    val df = Seq((1L, Some(10.0)), (2L, Some(-3.0)), (3L, None))
      .toDF("id", "v")
    // clean: ids positive everywhere
    val out = DataQuality.gate(df, Seq("id_positive" -> (col("id") > 0)))
    assert(out.count() == 3)
    // two breaches: one negative v, and the NULL v counts as a
    // violation too (unknown is not a pass)
    val ex = intercept[DataQuality.ExpectationsFailed] {
      DataQuality.gate(df, Seq(
        "id_positive" -> (col("id") > 0),
        "v_non_negative" -> (col("v") >= 0)))
    }
    assert(ex.failed == Seq(DataQuality.Violation("v_non_negative", 2L)))
    assert(ex.getMessage.contains("v_non_negative: 2"))
    // tolerance: 2 violations allowed -> passes
    DataQuality.gate(df, Seq("v_non_negative" -> (col("v") >= 0)),
      maxViolations = 2L)
    // empty input has nothing to violate
    DataQuality.gate(df.limit(0), Seq("never" -> lit(false)))
  }

  test("observe() collects null/row counters on the same pass as the job") {
    val obs = Observation("dq")
    val df = Seq(
      (1L, Some(10.0)), (2L, None), (3L, Some(30.0)), (4L, None))
      .toDF("id", "v")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null_v"))
    // the "real work": an aggregation the pipeline actually wanted
    val total = df.agg(sum("v")).as[Option[Double]].head()
    assert(total.contains(40.0))
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("n_null_v") == 2L)
  }
}

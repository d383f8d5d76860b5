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

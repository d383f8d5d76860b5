package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keep a grouped aggregate
  * (count / sum / min / max / avg) up to date by MERGING per-batch
  * partial states instead of re-scanning history.
  *
  * At 100 TB the naive plan ("recompute the daily dashboard over the
  * full fact table") re-reads the corpus per refresh. The mergeable
  * form reads only the new batch: `partial(batch)` reduces it to one
  * bounded row per touched group, and `merge(state, delta)` combines
  * partials with a shuffle proportional to |touched groups|, never to
  * |history|. This is the classic partial-aggregate / materialized-
  * view-maintenance decomposition — the same map-side-combine algebra
  * Spark itself uses inside HashAggregate, lifted across batch
  * boundaries so the state can persist in a TableStore between runs.
  *
  * Only MERGEABLE statistics live in the state: count and sum are
  * commutative monoids, min/max are semilattices. Average is finished
  * from (sum, count) at read time — never stored, never merged.
  * Deletions are out of scope (sum/count would need retraction
  * support; min/max are not retractable without full per-group
  * history).
  *
  * The value column must be non-null (coalesce upstream, or route
  * nulls through DataQuality.quarantine): `n` counts ROWS, so a null
  * value would deflate avg_v and skew any count-vs-sum consumer —
  * same contract as the MvRewrite registration gate.
  *
  * Sums are exact DECIMAL(28,2): merge order across batches must not
  * change the result, and FP addition is not associative. Same rule
  * as QualityModel/KMeans — bit-identical on any cluster layout.
  */
object AggMaintain {

  private val stateCols = Seq("n", "sum_v", "min_v", "max_v")

  /** Reduce one batch to per-group partial state. One hash shuffle of
    * already-combined partials (map-side combine is automatic for
    * these aggregates).
    */
  def partial(batch: DataFrame, keys: Seq[String], value: String): DataFrame =
    batch.groupBy(keys.map(k => col(s"`$k`")): _*).agg(
      count(lit(1)).as("n"),
      sum(col(s"`$value`").cast("decimal(28,2)")).as("sum_v"),
      min(col(s"`$value`")).as("min_v"),
      max(col(s"`$value`")).as("max_v"))

  /** Merge a delta's partial state into the stored state. Cost is one
    * shuffle over |stored groups| + |touched groups| single rows —
    * independent of how many raw rows ever contributed.
    */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    require(stateCols.forall(state.columns.contains) &&
      stateCols.forall(delta.columns.contains),
      s"state/delta must carry partial columns $stateCols")
    state.unionByName(delta)
      .groupBy(keys.map(k => col(s"`$k`")): _*).agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** Finish the state for serving: cast the exact decimal sum down and
    * derive the average. `avg_v` is the 2-dp HALF_UP mean computed in
    * exact LONG arithmetic (the q_lm_score discipline,
    * LangModel.scoreDocs): the 2-dp sum times 100 is an exact integer
    * S2, `k = (2·|S2| + n) div (2·n)` is the integer HALF_UP of
    * |S2|/n, and `±k/100` is one correctly-rounded double division —
    * bit-stable across engines where a DECIMAL quotient or
    * `round(double, 2)` is not.
    */
  def finish(state: DataFrame): DataFrame =
    state
      .withColumn("__s2",
        (col("sum_v").cast("decimal(30,2)") * lit(100L)).cast("long"))
      .select(
        state.columns.filterNot(stateCols.contains).toSeq
          .map(k => col(s"`$k`")) ++ Seq(
          col("n"),
          col("sum_v").cast("double").as("sum_v"),
          col("min_v"), col("max_v"),
          (when(col("__s2") < 0, lit(-1L)).otherwise(lit(1L)) *
            expr("(2 * abs(__s2) + n) div (2 * n)"))
            .cast("double").divide(lit(100.0)).as("avg_v")): _*)
}

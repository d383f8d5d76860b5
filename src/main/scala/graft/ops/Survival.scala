package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-to-event analysis: the Kaplan-Meier product-limit estimator
  * over right-censored durations (time to conversion, churn, first
  * purchase). Reference semantics are the classic estimator; the
  * engine contract is the usual one: reduce the subject table to a
  * calendar-bounded series FIRST (the ops/Stats reduced-series
  * contract), then run the sequential pass on ≤ #distinct-times rows
  * where a single-partition window is the honest plan.
  */
object Survival {

  /** Kaplan-Meier survival curve.
    *
    * Input: one row per subject — integral duration and an observed
    * flag (true = the event happened at `t`; false = censored at
    * `t`, the subject left the risk set without converting).
    * Output: one row per DISTINCT EVENT time, ascending:
    * `(t, n_risk, d_events, survival)` with
    * S(t) = Π_{u ≤ t} (1 − d_u / n_u).
    *
    * Determinism (the lm_score lattice discipline): each factor
    * enters the product as `round(ln(1 − d/n), 9)` — a 9-dp lattice
    * value — summed EXACTLY in DECIMAL(38,9) over the cumulative
    * window, with ONE exp at the end under `round(,6)`. Any engine
    * replaying the same lattice gets the identical curve, independent
    * of row order or fold shape; a d = n_risk step (the risk set
    * converts out entirely) short-circuits to survival 0 rather than
    * feeding ln(0) into the lattice.
    *
    * Scale: subjects collapse to per-duration counts through one
    * hash exchange (map-side partials, ≤ #distinct-times output
    * rows); risk sets are a reverse cumulative sum on the reduced
    * series.
    */
  def kaplanMeier(
      df: DataFrame, durationCol: Column,
      observedCol: Column): DataFrame = {
    val counts = df
      .select(durationCol.as("t"), observedCol.as("obs"))
      .groupBy(col("t"))
      .agg(sum(when(col("obs"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("c"))
    val w = Window.orderBy(col("t"))
    val risk = counts
      .withColumn("n_risk", sum(col("c")).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    val lat = risk
      .withColumn("lp",
        when(col("d") > 0 && col("d") < col("n_risk"),
          round(log(lit(1.0) -
            col("d").cast("double") / col("n_risk").cast("double")), 9))
          .otherwise(lit(0.0)).cast("decimal(28,9)"))
      // a step that empties the risk set: survival is exactly 0 from
      // here on (ln(0) must never enter the lattice)
      .withColumn("zf",
        when(col("d") > 0 && col("d") === col("n_risk"), 1L)
          .otherwise(0L))
    lat
      .withColumn("ls", sum(col("lp")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("zc", sum(col("zf")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("d") > 0)
      .select(col("t"), col("n_risk"), col("d").as("d_events"),
        when(col("zc") > 0, lit(0.0))
          .otherwise(round(exp(col("ls").cast("double")), 6))
          .as("survival"))
  }
}

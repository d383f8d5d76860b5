package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted averaging over irregular event streams — the TWAP of
  * finance desks and the "average concurrent value" of ops metrics.
  * A plain `avg(value)` over events weights each SAMPLE equally; the
  * time-weighted mean weights each VALUE by how long it was in force
  * (until the key's next event), which is the honest summary of any
  * sampled-on-change series: a sensor that reports once an hour and
  * once a millisecond should not average the same.
  *
  * Semantics: per key, order events by `(ts, tie)`; each value holds
  * from its own timestamp to the next event's; the LAST event has
  * nothing to hold against and carries zero weight (the observation
  * window ends at the key's last event — pass an explicit horizon
  * event per key upstream if the final value should count). Keys
  * with fewer than two distinct timestamps have a zero-length window
  * and are dropped, not emitted as NULL/NaN.
  *
  * Exactness: `value` must be integral (scale money to cents
  * upstream — the q_rolling_window convention); weights are integer
  * microseconds, so the weighted sum and the total duration are
  * exact longs, and the final division is one double op both engines
  * round identically.
  *
  * 100 TB shape: ONE exchange hash-partitioned on the key; the only
  * window is the key-partitioned `lead` (bounded by one key's
  * history), and the weighted sum is a map-side-combinable aggregate
  * on the same partitioning — Spark reuses the exchange between the
  * window and the groupBy.
  */
object TimeWeighted {

  /** @param valueCol integral-valued column (cents, counts, …)
    * @return (key, twa, span_us): the time-weighted average of
    *         `valueCol` per key as a double, and the total observed
    *         span in microseconds
    */
  def timeWeightedAvg(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      tieCol: Column,
      valueCol: Column): DataFrame = {
    val base = df
      .filter(keyCol.isNotNull && tsCol.isNotNull && valueCol.isNotNull)
      .select(keyCol.as("key"), unix_micros(tsCol).as("us"),
        valueCol.cast("long").as("v"), tieCol.as("tie"))
    val w = Window.partitionBy(col("key")).orderBy(col("us"), col("tie"))
    base
      .withColumn("dur", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("dur").isNotNull)
      .groupBy(col("key"))
      .agg(sum(col("v") * col("dur")).as("num"),
        sum(col("dur")).as("span_us"))
      .filter(col("span_us") > 0)
      .select(col("key"),
        (col("num").cast("double") / col("span_us").cast("double"))
          .as("twa"),
        col("span_us"))
  }
}

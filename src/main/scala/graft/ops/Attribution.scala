package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-touch attribution over an event stream: for every
  * conversion event, which earlier touch event gets the credit. The
  * reference's event log (producer's click/view/signup/purchase
  * stream) answers "what drove this purchase" with exactly this
  * operator; it is also the session-stitching primitive behind ads
  * ROI dashboards.
  *
  * Two standard models in one pass: FIRST-touch (the touch that
  * opened the user's history) and LAST-touch (the most recent touch
  * strictly before the conversion). Both are window lookups over the
  * user's own timeline — `(ts, id)` ordered, so the order is total
  * and the result layout-independent — computed with
  * `first/last(ignoreNulls)` over a strictly-preceding ROWS frame.
  * Conversions with no preceding touch attribute to NULL (surface it
  * as 'none' downstream — deliberate, not silently dropped: unmatched
  * conversions are the metric that catches instrumentation gaps).
  *
  * 100 TB shape: ONE exchange, hash-partitioned on the user key; the
  * windows are user-partitioned sorts (bounded by one user's
  * history, never a global sort), and both models plus any
  * downstream per-channel aggregate reuse the same partitioning.
  * Event-time skew (one bot user with 10⁸ events) is the only
  * hazard; cap per-user history upstream if the log has one.
  */
object Attribution {

  /** Per-conversion attribution rows.
    *
    * @param touchTypes     event types that can carry credit
    * @param conversionType the event type being attributed
    * @return one row per conversion event: the conversion's id
    *         column, user, ts, `channel_first`, `channel_last`
    *         (NULL when no touch precedes), and the conversion's
    *         `value`
    */
  def attribute(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      idCol: Column,
      typeCol: Column,
      valueCol: Column,
      touchTypes: Seq[String],
      conversionType: String): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    val touch = when(typeCol.isin(touchTypes: _*), typeCol)
    val w = Window.partitionBy(userCol).orderBy(tsCol, idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("channel_first", first(touch, ignoreNulls = true).over(w))
      .withColumn("channel_last", last(touch, ignoreNulls = true).over(w))
      .filter(typeCol === conversionType)
      .select(idCol.as("conversion_id"), userCol.as("user"),
        tsCol.as("ts"), col("channel_first"), col("channel_last"),
        valueCol.as("value"))
  }
}

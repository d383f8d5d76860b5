package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust outlier detection over a BOUNDED series — the ops alarm for
  * "this day's event volume is wrong" (an outage, a bot flood, a
  * broken producer). Median/MAD, not mean/stddev: one bot-flood day
  * inflates a stddev enough to hide itself (masking), while the
  * median and the median absolute deviation ignore up to half the
  * points being bad — the standard robust-statistics argument.
  *
  * Exactness discipline: everything is INTEGER arithmetic on long
  * values. The median is the LOWER middle of the sorted values
  * (order statistic at 1-based rank `(n+1) div 2` — never an
  * averaged midpoint, which would leave the integer lattice), MAD is
  * the same order statistic over `|v − median|`, and the flag is the
  * integer comparison `|v − median| > k·MAD` — bit-identical on any
  * layout and replayed by a SQL oracle with a row_number order
  * statistic. Note `MAD = 0` (more than half the values identical)
  * flags EVERY deviating point — the correct degenerate reading: in
  * a series that constant, any change is an anomaly.
  *
  * Contract: `series` is one row per bucket with a LONG value — the
  * OUTPUT of a time-bucketed aggregate, so its cardinality is the
  * time dimension (days/hours), bounded by calendar, not by data
  * volume. The values collect to the driver (the [[Dsir.fit]]
  * bounded-model rule) and return to the plan as literals; the 100 TB
  * cost lives in the upstream count aggregate, not here.
  */
object Anomaly {

  /** Flag outliers: `series` columns pass through plus
    * `(median, mad, is_anomaly)`.
    */
  def robustOutliers(
      series: DataFrame,
      valueCol: String,
      k: Long = 3L): DataFrame = {
    require(k >= 1L, s"k must be >= 1, got $k")
    val vals = series.select(col(s"`$valueCol`").cast("long"))
      .collect().map(_.getLong(0)).sorted
    require(vals.nonEmpty, "empty series")
    def lowerMedian(xs: Array[Long]): Long = xs((xs.length - 1) / 2)
    val med = lowerMedian(vals)
    val mad = lowerMedian(vals.map(v => math.abs(v - med)).sorted)
    series
      .withColumn("median", lit(med))
      .withColumn("mad", lit(mad))
      .withColumn("is_anomaly",
        // same long cast as the order statistics above — a
        // fractional-typed series must not mix truncated median/MAD
        // with exact values in the comparison
        abs(col(s"`$valueCol`").cast("long") - lit(med)) >
          lit(k) * lit(mad))
  }
}

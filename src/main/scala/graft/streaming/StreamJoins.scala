package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state — the streaming twins of
  * [[graft.ops.TemporalJoins]].
  */
object StreamJoins {

  /** Watermarked stream-stream INTERVAL join: each left event pairs
    * with right events sharing its `keys` whose event time lies in
    * (`leftTs`, `leftTs` + `maxGapSec`] — the streaming form of
    * [[graft.ops.TemporalJoins.bandJoin]] (same predicate, same
    * semantics on any prefix of the streams).
    *
    * State is BOUNDED: both sides carry watermarks and the join
    * condition time-bounds each side relative to the other, which is
    * exactly what Structured Streaming needs to evict buffered rows —
    * a left row is dropped once the right watermark passes
    * `leftTs + maxGapSec`, a right row once the left watermark passes
    * its latest possible probe. Without the two-sided bound the join
    * state grows with the stream; with it, state is
    * O(rate × (gap + watermark delay)) per key regardless of stream
    * length — the 100 TB/day property.
    *
    * Inner join, append mode. Non-key column names must be disjoint
    * across the sides (rename upstream), same contract as bandJoin.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      maxGapSec: Long,
      watermark: String = "2 hours"): DataFrame = {
    require(maxGapSec > 0, s"maxGapSec must be positive, got $maxGapSec")
    val sharedNonKey = (left.columns.toSet -- keys) & (right.columns.toSet -- keys)
    require(sharedNonKey.isEmpty,
      s"non-key columns ${sharedNonKey.mkString(",")} exist on both sides — " +
        "rename one side")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
      col(rightTs) > col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxGapSec SECOND")
    keys.foldLeft(l.join(r, cond, "inner"))((df, k) => df.drop(r(k)))
  }
}

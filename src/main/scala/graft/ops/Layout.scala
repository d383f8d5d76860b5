package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write layout — multi-column data skipping.
  *
  * A single-key sorted layout ([[graft.streaming.TableStore]]'s opt-in
  * `sortBy`) buys parquet row-group skipping on ONE column; queries
  * filtering the OTHER frequent column still scan everything. Z-order
  * interleaves the bits of per-column QUANTILE ranks, so rows close in
  * any filtered dimension land in few row groups — the min/max footer
  * stats of every reordered column stay tight and prune on each
  * dimension without reader-side configuration (the Delta/Iceberg
  * OPTIMIZE ZORDER capability, engine-native).
  *
  * Pipeline (all declarative, two jobs total):
  *  1. one aggregation pass computes `2^bits − 1` approx-quantile cut
  *    points per column (skew-robust: equal-POPULATION bins, where
  *    equal-width binning collapses under a heavy hitter) — bounded
  *    driver result, inlined as plan literals;
  *  2. per row, each column's bin is a `2^bits`-step fold over its
  *    boundary literals, bins interleave into the z-value with pure
  *    shift/or arithmetic (codegen-friendly, no UDF);
  *  3. `repartitionByRange` on the z-value (ONE range exchange —
  *    distributed, never a single-partition sort) +
  *    `sortWithinPartitions`, so both file-level ranges and row-group
  *    stats align with the curve.
  *
  * 100 TB: the quantile pass is one `approx_percentile` aggregation
  * (mergeable sketch partials); the write is the same one-shuffle cost
  * as any repartition — you pay it once at layout time, every
  * multi-dimension scan after that skips.
  */
object Layout {

  /** Quantile cut points per column: `2^bits − 1` interior boundaries
    * from one approx_percentile pass over all `cols` together.
    */
  def quantileBoundaries(
      df: DataFrame, cols: Seq[String], bits: Int,
      accuracy: Int = 10000): Map[String, Array[Double]] = {
    require(bits >= 1 && bits <= 8, s"bits must be in [1,8], got $bits")
    val nb = 1 << bits
    val ps = (1 until nb).map(_.toDouble / nb)
    require(cols.nonEmpty, "need at least one z-order column")
    val row = df.select(cols.map(c =>
      percentile_approx(col(c).cast("double"),
        array(ps.map(lit(_)): _*), lit(accuracy)).as(c)): _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      // an all-NULL (or empty-input) column has no quantiles — give it
      // zero boundaries, so every row bins to 0 and the column simply
      // stops contributing to the curve instead of NPE-ing the write
      c -> (if (row.isNullAt(i)) Array.empty[Double]
            else row.getSeq[Double](i).toArray)
    }.toMap
  }

  /** Bin index in `[0, 2^bits)`: the count of boundaries ≤ x, as a
    * fold over the boundary literals. NULL pins to bin 0 (nulls
    * cluster together at the curve origin).
    */
  private[graft] def binOf(x: Column, boundaries: Array[Double]): Column =
    if (boundaries.isEmpty) lit(0)
    else coalesce(
      aggregate(
        array(boundaries.map(lit(_)): _*),
        lit(0),
        (acc, b) => acc + when(x.cast("double") >= b, 1).otherwise(0)),
      lit(0))

  /** Interleave `bits` bits of each bin column (column j contributes
    * bit b to z-position `b * n + j`): pure shift/or integer
    * arithmetic over long columns.
    */
  private[graft] def interleave(bins: Seq[Column], bits: Int): Column = {
    val n = bins.size
    require(n * bits <= 62, s"z-value would overflow a long: $n x $bits")
    val terms = for {
      b <- 0 until bits
      (bin, j) <- bins.zipWithIndex
    } yield shiftleft(
      shiftright(bin.cast("long"), b).bitwiseAND(lit(1L)), b * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The z-value column for `cols` under `boundaries`. */
  def zValue(
      cols: Seq[String], boundaries: Map[String, Array[Double]],
      bits: Int): Column =
    interleave(cols.map(c => binOf(col(c), boundaries(c))), bits)

  /** `df` re-ordered along the curve: one range exchange on the
    * z-value + within-partition sort, helper column dropped (the
    * projection preserves per-partition order). Whatever writes the
    * result inherits the layout.
    */
  def zOrdered(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 6,
      numFiles: Int = 32,
      accuracy: Int = 10000): DataFrame = {
    val bounds = quantileBoundaries(df, cols, bits, accuracy)
    df.withColumn("__z", zValue(cols, bounds, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Rewrite `df` in z-order over `cols` into `numFiles` range-
    * partitioned parquet files at `path`. Content-preserving — only
    * the physical order (and therefore the footer stats) changes.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      cols: Seq[String],
      bits: Int = 6,
      numFiles: Int = 32,
      accuracy: Int = 10000,
      rowGroupBytes: Option[Long] = None): Unit = {
    val ordered = zOrdered(df, cols, bits, numFiles, accuracy)
      .write.mode("overwrite")
    // skipping granularity = row group; production keeps the parquet
    // default (fewer, larger groups), tests shrink it to get many
    // groups from small data
    rowGroupBytes.fold(ordered)(b =>
      ordered.option("parquet.block.size", b.toString))
      .parquet(path)
  }

  /** Layout compaction for a [[graft.streaming.TableStore]] table:
    * rewrite the whole stored corpus z-ordered as ONE fresh version —
    * [[graft.streaming.TableStore.compact]]'s read-fan-out fold plus
    * multi-column skipping for every read after it. Same single-writer
    * contract as any store rewrite.
    */
  def compactZOrdered(
      spark: org.apache.spark.sql.SparkSession,
      store: graft.streaming.TableStore,
      table: String,
      schema: org.apache.spark.sql.types.StructType,
      cols: Seq[String],
      bits: Int = 6,
      numFiles: Int = 32): Unit =
    store.overwrite(table,
      zOrdered(store.read(spark, table, schema), cols, bits, numFiles))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-encoding operators for training-data pipelines: leave-one-
  * out target encoding and equi-depth quantile binning. Both follow
  * the engine's exact-arithmetic contract (integer cents, DECIMAL
  * accumulation, ONE final double division under round(,6)) and the
  * broadcast-dimension scale shape: the per-group state is ≤ #groups
  * rows, attached back onto the fact scan by broadcast — the fact
  * table itself NEVER shuffles.
  */
object Encoding {

  private val Dec = "decimal(38,0)"

  /** Leave-one-out target encoding of a categorical column against an
    * integral target: loo_i = (S_g − y_i) / (n_g − 1) — the standard
    * leakage-free mean encoding (each row's own target is excluded
    * from its feature). S_g accumulates in DECIMAL(38,0) so the
    * encoding is layout-independent at any scale; the one double
    * division per row happens under round(,6). Groups of size 1 have
    * no leave-one-out mean → null.
    *
    * Scale shape: one tiny per-group aggregate (map-side partials,
    * #groups output rows) broadcast-joined back onto the fact scan.
    *
    * @param df       fact rows (all columns pass through)
    * @param groupCol categorical column
    * @param valueCol integral target (e.g. cents)
    * @param outCol   name of the encoded output column
    */
  def looTargetEncode(
      df: DataFrame, groupCol: Column, valueCol: Column,
      outCol: String): DataFrame = {
    val base = df.withColumn("_loo_y", valueCol)
    val agg = base
      .groupBy(groupCol.as("_loo_g"))
      .agg(sum(col("_loo_y").cast(Dec)).as("_loo_s"),
        count(lit(1)).as("_loo_n"))
    base
      .join(broadcast(agg), groupCol === col("_loo_g"))
      .withColumn(outCol,
        when(col("_loo_n") > 1,
          round((col("_loo_s") - col("_loo_y").cast(Dec))
              .cast("double") /
            (col("_loo_n") - lit(1L)).cast("double"), 6)))
      .drop("_loo_g", "_loo_s", "_loo_n", "_loo_y")
  }

  /** Equi-depth bin assignment (1..nBins) of an integral value per
    * group. Thresholds come from [[Stats.weightedQuantiles]] at unit
    * weight (the inclusive cumulative definition), pivoted to ONE row
    * per group and broadcast — bin = 1 + Σ_k [v > q_k], a pure-integer
    * comparison ladder inside codegen. Deterministic on any layout:
    * the thresholds are exact order statistics, not approximations.
    *
    * @param nBins must divide 100 (the quantile grid is integer
    *              percents)
    * @return df's columns plus `outCol` (int bin 1..nBins)
    */
  def quantileBins(
      df: DataFrame, groupCol: Column, valueCol: Column,
      nBins: Int, outCol: String): DataFrame = {
    require(nBins >= 2 && 100 % nBins == 0,
      s"nBins must be >= 2 and divide 100, got $nBins")
    val pcts = (1 until nBins).map(i => i * 100 / nBins)
    val aggCols = pcts.map(p =>
      max(when(col("pct") === p, col("value"))).as(s"_qb_q$p"))
    val th = Stats
      .weightedQuantiles(df, groupCol, valueCol, lit(1L), pcts)
      .groupBy(col("g").as("_qb_g"))
      .agg(aggCols.head, aggCols.tail: _*)
    val binExpr = pcts
      .map(p => when(valueCol > col(s"_qb_q$p"), 1).otherwise(0))
      .reduce(_ + _) + lit(1)
    df.join(broadcast(th), groupCol === col("_qb_g"))
      .withColumn(outCol, binExpr)
      .drop("_qb_g" +: pcts.map(p => s"_qb_q$p"): _*)
  }
}

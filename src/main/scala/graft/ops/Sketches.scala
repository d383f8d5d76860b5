package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches across table epochs.
  *
  * q_sketch_accuracy already pins one-shot approximate distinct
  * against its exact twin; what a 100 TB corpus additionally needs is
  * the MERGEABLE form: per-epoch (per-partition, per-day) HLL sketch
  * state that persists as a small binary column and answers
  * "distinct users across ANY subset of epochs" by unioning sketches
  * — never re-scanning closed epochs. An epoch's sketch is computed
  * once when the epoch seals (riding the same pass that wrote it),
  * after which cross-epoch rollups cost |epochs| × ~2^lgK bytes,
  * independent of row counts. This is the Dataflow/DataSketches
  * "mergeable summaries" algebra (Agarwal et al., "Mergeable
  * Summaries", PODS'12) on Spark's built-in DataSketches HLL
  * expressions — not a custom sketch.
  *
  * `epochSketches` → one row per epoch `(epoch, sketch, n_rows)`;
  * `mergeEstimate` → union the (filtered) sketches to one estimate.
  * Both are codegen'd Catalyst aggregates (HllSketchAgg/HllUnionAgg);
  * map-side combine keeps the shuffle at one sketch per (epoch ×
  * partition).
  */
object Sketches {

  def epochSketches(
      df: DataFrame,
      epoch: Column,
      value: Column,
      lgK: Int = 12): DataFrame =
    df.groupBy(epoch.as("epoch"))
      .agg(
        hll_sketch_agg(value, lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  def mergeEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("estimate"),
      sum(col("n_rows")).as("n_rows"))
}

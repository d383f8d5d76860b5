package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.text.TextOps

/** Sequence packing: assign documents to fixed-token-budget context
  * windows — the last preprocessing step of a pretraining pipeline,
  * where a shuffled corpus is concatenated into model-context-length
  * sequences with minimal padding waste.
  *
  * Design for 100 TB: packing is greedy and therefore sequential, so
  * it must never be a single global scan. Documents are first routed
  * into independent pack groups ("buckets"), and the greedy fill runs
  * per bucket — embarrassingly parallel across buckets, linear within
  * one. Bucket count is the scale knob: size buckets so one bucket's
  * (doc_id, n_tokens) pairs fit comfortably in a task (~16 bytes/doc;
  * 1M docs/bucket ≈ 16 MB — far below executor memory), and the
  * assignment output streams back out of the explode. The within-
  * bucket fold is the native linear [[graft.functions.PackWindows]]
  * expression, not an `aggregate()` HOF (which re-copies its
  * accumulator array per element — O(g²) in group size).
  *
  * Determinism: bucket = doc_id mod buckets and fill order = doc_id
  * ascending, so the assignment is a pure function of the corpus —
  * layout-independent, engine-portable (the DuckDB oracle reproduces
  * it with a recursive CTE), and stable under re-runs. Production
  * pipelines wanting a "shuffled" pack order get it by bucketing and
  * ordering on `xxhash64(doc_id)` instead — same machinery, one
  * column swap — at the cost of the cross-engine oracle.
  */
object Packing {

  /** Per-document window assignment: (doc_id, n_tokens, bucket,
    * win_idx), where `win_idx` counts windows within the bucket.
    * A document larger than `capacity` occupies a window alone.
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      capacity: Long = 256L,
      buckets: Int = 8): DataFrame = {
    require(buckets > 0, "need at least one pack bucket")
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"),
      // null text packs as a zero-width doc (same rule as the null
      // guard inside PackWindows) rather than poisoning the fold
      coalesce(TextOps.tokenCount(col(textCol)), lit(0))
        .cast("long").as("n_tokens"))
      .withColumn("bucket", pmod(col("doc_id"), lit(buckets.toLong)))
    // ONE shuffle keyed on bucket; array_sort on (doc_id, n_tokens)
    // structs orders by doc_id (ids are unique), fixing the fold order
    val grouped = base
      .groupBy(col("bucket"))
      .agg(array_sort(
        collect_list(struct(col("doc_id"), col("n_tokens")))).as("ds"))
    grouped
      .select(
        col("bucket"),
        explode(arrays_zip(
          col("ds"),
          GraftFunctions.packWindows(
            transform(col("ds"), d => d("n_tokens")), capacity).as("win")))
          .as("z"))
      .select(
        col("z.ds.doc_id").as("doc_id"),
        col("z.ds.n_tokens").as("n_tokens"),
        col("bucket"),
        col("z.win").as("win_idx"))
  }

  /** Window-level rollup of [[packSequences]]: one row per packed
    * context window with its document count and fill — the padding-
    * waste report ((capacity - fill)/capacity summed over windows is
    * the tokens a fixed-length trainer would pad).
    */
  def packedWindows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      capacity: Long = 256L,
      buckets: Int = 8): DataFrame =
    packSequences(docs, idCol, textCol, capacity, buckets)
      .groupBy(col("bucket"), col("win_idx"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("fill_tokens"))
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.types._

import graft.ops.AggMaintain

/** Streaming materialized-view maintenance: fold each micro-batch's
  * partial aggregate into a [[TableStore]] state table, exactly once —
  * the write half of the MV loop whose read half is
  * [[graft.plans.MvRewrite]] (register the state path after a refresh
  * and existing `fact.groupBy(keys).agg(…)` queries answer from it).
  *
  * Per batch the cost is [[AggMaintain.partial]] over the BATCH (one
  * bounded row per touched group) plus a merge against |stored groups|
  * rows — never a rescan of history. That is the 100 TB refresh
  * contract: state size tracks group cardinality, not fact volume.
  *
  * Exactly-once: Structured Streaming re-delivers a micro-batch after
  * a crash-before-checkpoint, and a plain fold would double-count it.
  * The store's snapshot META carries the last folded batch id, written
  * in the SAME atomic publish as the data — a replayed `batchId ≤
  * stored` is a no-op, and the CAS `expectVersion` guard turns a racing
  * concurrent maintainer into a loud failure instead of a lost update.
  * (Same idempotence discipline as [[CorpusIngest]]'s epoch replay.)
  *
  * Sums are normalized to DECIMAL(38,2) before persisting so the state
  * schema is identical whether a snapshot came from one fold or many
  * (partial() emits (28,2); merge() widens — the store round-trips one
  * fixed schema).
  */
object MvMaintain {

  private val BatchKey = "mv.last_batch"

  /** State schema for `keys` drawn from `factSchema` plus the
    * mergeable statistics of `value` — the store read/write contract.
    */
  def stateSchema(
      factSchema: StructType, keys: Seq[String], value: String): StructType = {
    def field(n: String): StructField = factSchema.fields
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${factSchema.fieldNames.mkString(", ")}"))
    StructType(
      keys.map(k => field(k)) ++ Seq(
        StructField("n", LongType),
        StructField("sum_v", DecimalType(38, 2)),
        StructField("min_v", field(value).dataType),
        StructField("max_v", field(value).dataType)))
  }

  /** Fold ONE batch into the stored state (the `foreachBatch` body).
    * Idempotent under batch replay; safe to call directly for
    * batch-mode refreshes with a caller-managed monotone id.
    */
  def foldBatch(
      store: TableStore,
      table: String,
      keys: Seq[String],
      value: String)(batch: DataFrame, batchId: Long): Unit = {
    val lastDone = store.readMeta(table).get(BatchKey).map(_.toLong)
    if (lastDone.exists(_ >= batchId)) return // replayed batch: already folded
    val schema = stateSchema(batch.schema, keys, value)
    val expect = store.currentVersion(table)
    val delta = AggMaintain.partial(batch, keys, value)
      .withColumn("sum_v", col("sum_v").cast("decimal(38,2)"))
    val next = expect match {
      case None => delta
      case Some(_) =>
        AggMaintain.merge(
          store.read(batch.sparkSession, table, schema), delta, keys)
          .withColumn("sum_v", col("sum_v").cast("decimal(38,2)"))
    }
    store.overwrite(table, next.select(schema.fieldNames.map(col).toSeq: _*),
      meta = Map(BatchKey -> batchId.toString),
      expectVersion = Some(expect))
  }

  /** Attach the maintainer to a streaming fact source. The caller
    * starts the returned writer with its checkpoint location.
    */
  def maintain(
      stream: DataFrame,
      store: TableStore,
      table: String,
      keys: Seq[String],
      value: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch(foldBatch(store, table, keys, value) _)

  /** Convenience: start with a checkpoint dir. */
  def start(
      stream: DataFrame,
      store: TableStore,
      table: String,
      keys: Seq[String],
      value: String,
      checkpoint: String): StreamingQuery =
    maintain(stream, store, table, keys, value)
      .option("checkpointLocation", checkpoint)
      .start()
}

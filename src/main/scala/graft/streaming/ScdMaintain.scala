package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.types._

import graft.ops.Scd

/** Streaming SCD2 maintenance: fold each micro-batch of dimension
  * updates into a [[TableStore]] history table, exactly once — the
  * history-keeping upgrade of the reference's streaming customer sync
  * (kafka_consumer.py's overwrite-in-place loses every previous
  * version; this keeps them all, so [[graft.ops.Scd.asOfLookup]] can
  * answer "what did this customer look like when that order was
  * placed" for any past batch).
  *
  * Per batch: collapse the batch to ONE update per key (greatest
  * `seqCol`, ties broken by the full attribute struct — a total,
  * layout-independent order), then [[Scd.scd2Merge]] against the
  * stored history with the duplicate guard OFF (the collapse IS the
  * guard), then one atomic snapshot publish. Cost per batch is the
  * merge's one key shuffle against the OPEN slice; nothing scans
  * closed history.
  *
  * Exactly-once: the MvMaintain discipline — the last folded batch id
  * rides the snapshot meta inside the same atomic publish, so a
  * crash-replayed batch is a no-op, and the CAS `expectVersion` turns
  * a racing maintainer into a loud failure instead of interleaved
  * history corruption.
  *
  * `batchTimeOf` maps the batch id to the `valid_from`/`valid_to`
  * stamp for versions opened/closed by that batch. It must be
  * DETERMINISTIC (a replayed batch must stamp the same value —
  * `current_timestamp()` would fork history on replay); monotone in
  * batch id so intervals nest correctly.
  */
object ScdMaintain {

  private val BatchKey = "scd.last_batch"

  /** History schema: the update schema plus SCD2 bookkeeping. */
  def historySchema(updateSchema: StructType, timeType: DataType): StructType =
    StructType(updateSchema.fields.toSeq ++ Seq(
      StructField("valid_from", timeType),
      StructField("valid_to", timeType),
      StructField("is_current", BooleanType)))

  /** Collapse a batch to one row per key: the row with the greatest
    * (seqCol, attrs…) struct — deterministic on any layout, one
    * map-side-combined aggregate. Exposed for callers that pre-shape
    * batches themselves.
    */
  def collapseBatch(
      batch: DataFrame, key: String, seqCol: String): DataFrame = {
    val attrs = batch.columns.filterNot(c => c == key || c == seqCol).toSeq
    batch
      .groupBy(col(s"`$key`"))
      .agg(max(struct((seqCol +: attrs).map(c => col(s"`$c`")): _*))
        .as("__last"))
      .select(col(s"`$key`") +:
        attrs.map(c => col(s"__last.`$c`").as(c)): _*)
  }

  /** Fold ONE batch into the stored history (the `foreachBatch`
    * body). Idempotent under batch replay; safe to call directly for
    * batch-mode loads with a caller-managed monotone id.
    */
  def foldBatch(
      store: TableStore,
      table: String,
      key: String,
      seqCol: String,
      batchTimeOf: Long => Column)(batch: DataFrame, batchId: Long): Unit = {
    val lastDone = store.readMeta(table).get(BatchKey).map(_.toLong)
    if (lastDone.exists(_ >= batchId)) return // replayed batch
    val collapsed = collapseBatch(batch, key, seqCol)
    val t = batchTimeOf(batchId)
    val timeType = batch.select(t.as("__t")).schema.head.dataType
    val schema = historySchema(collapsed.schema, timeType)
    val expect = store.currentVersion(table)
    val next = expect match {
      case None => Scd.scd2Init(collapsed, t)
      case Some(_) =>
        Scd.scd2Merge(
          store.read(batch.sparkSession, table, schema),
          collapsed, key, t, skipDupCheck = true)
    }
    store.overwrite(table, next.select(schema.fieldNames.map(col).toSeq: _*),
      meta = Map(BatchKey -> batchId.toString),
      expectVersion = Some(expect))
  }

  /** Attach the maintainer to a streaming update source. The caller
    * starts the returned writer with its checkpoint location.
    */
  def maintain(
      stream: DataFrame,
      store: TableStore,
      table: String,
      key: String,
      seqCol: String,
      batchTimeOf: Long => Column): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch(foldBatch(store, table, key, seqCol, batchTimeOf) _)

  /** Convenience: start with a checkpoint dir. */
  def start(
      stream: DataFrame,
      store: TableStore,
      table: String,
      key: String,
      seqCol: String,
      batchTimeOf: Long => Column,
      checkpoint: String): StreamingQuery =
    maintain(stream, store, table, key, seqCol, batchTimeOf)
      .option("checkpointLocation", checkpoint)
      .start()
}

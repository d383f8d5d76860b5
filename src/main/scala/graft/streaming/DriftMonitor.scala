package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.types._

import graft.text.{Dsir, Drift}

/** Streaming distribution-drift gate: score every micro-batch of
  * documents against the REFERENCE distribution of everything
  * ingested before it — the ops alarm for "this crawl/feed changed
  * under me" (a scraper breaking, a language flip, spam floods),
  * firing per batch instead of at the next offline audit.
  *
  * State, all bounded by the bucket count, in the [[TableStore]]:
  *  - `<name>_ref` — (bucket, c): cumulative hashed-gram counts of
  *    every batch folded so far (the reference distribution);
  *  - `<name>_log` — (batch_id, js, n_grams), hive-partitioned by
  *    batch_id: the drift score of each batch AT THE TIME IT ARRIVED
  *    (scored against the reference as of the previous batch), an
  *    append that physically writes one partition per batch.
  *
  * Per batch: ONE tokenize+count pass over the batch (output ≤
  * `buckets` rows, collected — the [[Dsir.fit]] bounded-model rule),
  * a driver-side JS computation against the stored reference
  * ([[Drift.jsOfCounts]] — same smoothing/rounding as the batch
  * operator, pinned equal in DriftSpec), then two snapshot publishes.
  * Nothing is proportional to history size.
  *
  * Exactly-once: the MvMaintain/ScdMaintain discipline — the last
  * folded batch id rides the REF table's snapshot meta; the log
  * partition writes FIRST, so a crash between the two publishes
  * replays into overwriting the same log partition (idempotent)
  * before the ref advances. CAS `expectVersion` on the ref publish
  * makes a racing monitor loud.
  *
  * The first batch scores against an EMPTY reference, which smooths
  * to the uniform distribution — its js row measures how far the
  * opening batch sits from uniform (document or drop row 0 in
  * alerting).
  */
object DriftMonitor {

  private val BatchKey = "drift.last_batch"

  val refSchema: StructType = StructType(Seq(
    StructField("bucket", IntegerType),
    StructField("c", LongType)))

  val logSchema: StructType = StructType(Seq(
    StructField("batch_id", StringType),
    StructField("js", DoubleType),
    StructField("n_grams", LongType)))

  /** The drift log so far: (batch_id, js, n_grams). */
  def log(spark: SparkSession, store: TableStore, name: String): DataFrame =
    store.read(spark, s"${name}_log", logSchema)

  /** Fold ONE batch: score it against the stored reference, append
    * the log row, advance the reference. Idempotent under replay.
    */
  def foldBatch(
      store: TableStore,
      name: String,
      textCol: Column,
      buckets: Int = 4096)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val lastDone = store.readMeta(s"${name}_ref").get(BatchKey).map(_.toLong)
    if (lastDone.exists(_ >= batchId)) return // replayed batch
    val expect = store.currentVersion(s"${name}_ref")
    val batchCounts = Dsir.bucketCounts(batch, textCol, buckets)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val refCounts = store.read(spark, s"${name}_ref", refSchema)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val js = Drift.jsOfCounts(refCounts, batchCounts, buckets)
    val nGrams = batchCounts.values.sum
    // log first (idempotent partition overwrite), then the ref with
    // the batch gate — a crash between the two replays harmlessly
    import spark.implicits._
    store.overwritePartitions(s"${name}_log",
      Seq((batchId.toString, js, nGrams)).toDF("batch_id", "js", "n_grams")
        .select(col("batch_id"), col("js"), col("n_grams")),
      "batch_id", Seq(batchId.toString))
    val merged = (refCounts.keySet ++ batchCounts.keySet).toSeq.sorted
      .map(b => (b, refCounts.getOrElse(b, 0L) + batchCounts.getOrElse(b, 0L)))
    store.overwrite(s"${name}_ref",
      merged.toDF("bucket", "c"),
      meta = Map(BatchKey -> batchId.toString),
      expectVersion = Some(expect))
  }

  /** Attach the monitor to a streaming document source. */
  def maintain(
      stream: DataFrame,
      store: TableStore,
      name: String,
      textCol: Column,
      buckets: Int = 4096): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch(foldBatch(store, name, textCol, buckets) _)

  /** Convenience: start with a checkpoint dir. */
  def start(
      stream: DataFrame,
      store: TableStore,
      name: String,
      textCol: Column,
      buckets: Int,
      checkpoint: String): StreamingQuery =
    maintain(stream, store, name, textCol, buckets)
      .option("checkpointLocation", checkpoint)
      .start()
}

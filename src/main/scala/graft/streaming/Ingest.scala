package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.ops.PosOps

/** Streaming ingest: the reference's 9-topic Kafka→CSV materialization
  * (EP3, `secondDataPipeline/kafka_consumer/kafka_consumer.py:379–409`)
  * re-expressed as ONE Structured Streaming query.
  *
  * The reference runs 9 daemon threads, each polling one KafkaConsumer
  * and rewriting whole CSV files with pandas. Here: a single stream of
  * (topic, value) records — `readStream.format("kafka").option(
  * "subscribe", <all 9>)` in production, any DataFrame with the same
  * two columns in tests — routed by the `topic` column, parsed with
  * `from_json` against per-entity schemas, and applied to the table
  * store in `foreachBatch` with relational upsert/delete (no row loops,
  * no whole-table rewrite races: single-writer per table, atomic swap).
  *
  * Scale: each micro-batch applies set-oriented operations; state
  * (sale-id counter, stock levels) lives in the store/checkpoint, not
  * a driver-side file like the reference's `sale_id_tracker.txt`
  * (kafka_consumer.py:56–68).
  */
object Ingest {

  /** Topic names — producer `kafka_producer.py:11–19`. */
  val saleTopics = Seq("transactions_sale", "transactions_edit", "transactions_remove")
  val productTopics = Seq("products_add", "products_edit", "products_remove")
  val customerTopics = Seq("customers_add", "customers_edit", "customers_remove")

  /** Event payload schemas — producer payload shapes
    * kafka_producer.py:127–135 (sale: no sale_id, assigned at ingest),
    * :187–196 (edit/remove), :332–339 (products), :480–484 (customers).
    */
  val saleSchema: StructType = StructType(Seq(
    StructField("sale_id", LongType),        // null on insert events
    StructField("sale_date", StringType),
    StructField("customer_id", IntegerType),
    StructField("product_id", IntegerType),
    StructField("quantity", IntegerType),
    StructField("price", DoubleType),
    StructField("total_price", DoubleType),
    StructField("payment_method", StringType)))

  val productSchema: StructType = StructType(Seq(
    StructField("product_id", IntegerType),
    StructField("product_name", StringType),
    StructField("product_description", StringType),
    StructField("product_category", StringType),
    StructField("product_price", DoubleType),
    StructField("stock_level", IntegerType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("customer_id", IntegerType),
    StructField("customer_name", StringType),
    StructField("customer_location", StringType)))

  /** Parse the raw (topic, value) stream into one entity's typed rows,
    * keeping the event kind (`add`/`sale`, `edit`, `remove`).
    */
  def parseEntity(raw: DataFrame, topics: Seq[String], schema: StructType): DataFrame =
    raw.filter(col("topic").isin(topics: _*))
      .select(
        element_at(split(col("topic"), "_"), -1).as("kind"),
        from_json(col("value"), schema).as("row"))
      .select(col("kind"), col("row.*"))

  /** Monotonic sale-id assignment for a micro-batch (SURVEY §7.4.1):
    * `max(existing) + row_number()` over the batch, ordered by a
    * deterministic key. Replaces the reference's single-writer counter
    * file; ids are unique and increase per batch epoch (cross-partition
    * total order within a batch is defined by the ordering key).
    */
  def assignSaleIds(batch: DataFrame, maxExisting: Long, orderBy: Seq[String]): DataFrame = {
    val w = Window.orderBy(orderBy.map(col): _*)
    batch.withColumn("sale_id", lit(maxExisting) + row_number().over(w))
  }

  /** Apply one micro-batch of entity events to the current table state:
    * inserts+edits upsert (updates win), removes anti-join out. Pure
    * relational — returns the new table value.
    */
  def applyEvents(current: DataFrame, events: DataFrame, key: String): DataFrame = {
    val dataCols = current.columns
    val upserts = events.filter(col("kind") =!= "remove")
      .select(dataCols.map(col).toIndexedSeq: _*)
      // last event per key in the batch wins (arrival order = kind-agnostic)
      .dropDuplicates(key)
    val removes = events.filter(col("kind") === "remove")
      .select(col(key))
    PosOps.upsert(current, upserts, key)
      .join(removes, Seq(key), "left_anti")
  }

  /** One streaming query materializing all three entity streams into
    * the table store, `foreachBatch` + `Trigger.AvailableNow` giving
    * the reference's hourly-batch semantics with checkpointed
    * exactly-once state.
    */
  def startIngest(
      spark: SparkSession,
      raw: DataFrame, // streaming (topic: string, value: string)
      store: TableStore,
      checkpoint: String): StreamingQuery = {
    raw.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyMicroBatch(spark, batch, store)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Batch application shared by the streaming query and tests. */
  def applyMicroBatch(spark: SparkSession, batch: DataFrame, store: TableStore): Unit = {
    batch.persist()
    try {
      // --- sales: assign ids to inserts, then upsert/remove ---
      val saleEvents = parseEntity(batch, saleTopics, saleSchema)
      if (!saleEvents.isEmpty) {
        val current = store.read(spark, "sales", saleSchema)
        val maxId = current.agg(coalesce(max(col("sale_id")), lit(0L)))
          .head().getLong(0)
        val inserts = assignSaleIds(
          saleEvents.filter(col("kind") === "sale").drop("sale_id"),
          maxId, Seq("sale_date", "customer_id", "product_id"))
          .select((Seq("kind") ++ saleSchema.fieldNames).map(col): _*)
        val edits = saleEvents.filter(col("kind") =!= "sale")
        val next = applyEvents(current,
          inserts.unionByName(edits), "sale_id")
        store.overwrite("sales", next)
      }

      // --- products / customers ---
      val prodEvents = parseEntity(batch, productTopics, productSchema)
      if (!prodEvents.isEmpty) {
        val current = store.read(spark, "products", productSchema)
        store.overwrite("products", applyEvents(current, prodEvents, "product_id"))
      }
      val custEvents = parseEntity(batch, customerTopics, customerSchema)
      if (!custEvents.isEmpty) {
        val current = store.read(spark, "customers", customerSchema)
        store.overwrite("customers", applyEvents(current, custEvents, "customer_id"))
      }
    } finally batch.unpersist()
  }

  /** Streaming windowed aggregation with watermark — the event-time
    * upgrade the reference lacks (processing-time threads only,
    * SURVEY §2.8): tumbling windows over an event-time column, late
    * data beyond the watermark dropped, append-mode emission on window
    * close.
    */
  def windowedCounts(
      events: DataFrame, // streaming, with event-time col "ts"
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
}

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

  /** Parse the raw (topic, value, seq) stream into one entity's typed
    * rows, keeping the event kind (`add`/`sale`, `edit`, `remove`) and
    * the replay order `seq`. Corrupt payloads (PERMISSIVE `from_json`
    * → every field null) are dropped rather than becoming null-keyed
    * rows — the reference's consumer thread would crash on them
    * (`json.loads`, kafka_consumer.py:16). The key alone can't be the
    * filter: sale inserts legitimately arrive without a sale_id.
    */
  def parseEntity(raw: DataFrame, topics: Seq[String], schema: StructType): DataFrame =
    raw.filter(col("topic").isin(topics: _*))
      .select(
        element_at(split(col("topic"), "_"), -1).as("kind"),
        col("seq"),
        from_json(col("value"), schema).as("row"))
      .filter(schema.fieldNames
        .map(f => col(s"row.$f").isNotNull).reduce(_ || _))
      .select(col("kind"), col("seq"), col("row.*"))

  /** Ensure the raw event frame carries a `seq` replay-order column:
    * Kafka batches use the per-partition `offset`; frames without
    * either get a partition-stable synthetic id (tests / ad-hoc
    * batches).
    */
  def withSeq(raw: DataFrame): DataFrame =
    if (raw.columns.contains("seq")) raw
    else if (raw.columns.contains("offset")) raw.withColumn("seq", col("offset"))
    else raw.withColumn("seq", monotonically_increasing_id())

  /** Monotonic sale-id assignment for a micro-batch (SURVEY §7.4.1):
    * ids are `maxExisting + 1 .. maxExisting + n`, dense and unique,
    * increasing in `orderBy` order. Two-pass, fully distributed:
    * range-repartition on the ordering key, `row_number` within each
    * partition, then add per-partition offsets (cumulative counts, one
    * tiny driver-side array of #partitions longs).
    *
    * Round 1 used `Window.orderBy` with no partitioning, which funnels
    * the whole batch through ONE partition — the classic streaming-path
    * scale-killer. `orderBy` should be (near-)unique: rows tied on the
    * full key may receive either of their ids across runs.
    */
  def assignSaleIds(batch: DataFrame, maxExisting: Long, orderBy: Seq[String]): DataFrame = {
    val orderCols = orderBy.map(col)
    val parts = math.max(1,
      batch.sparkSession.sessionState.conf.numShufflePartitions)
    // persisted: the count pass and the output pass must see the SAME
    // range boundaries (repartitionByRange samples its input)
    val withRn = batch.repartitionByRange(parts, orderCols: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_pid")).orderBy(orderCols: _*)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-partition counts: #partitions rows — a scalar-sized collect
    val counts = withRn.groupBy(col("_pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).scanLeft(0L) {
      case (acc, pid) => acc + counts.getOrElse(pid, 0L)
    }
    val offsetExpr = (0 until parts).foldLeft(lit(0L)) {
      case (e, pid) => when(col("_pid") === pid, lit(offsets(pid))).otherwise(e)
    }
    withRn
      .withColumn("sale_id", lit(maxExisting) + offsetExpr + col("_rn"))
      .drop("_pid", "_rn")
  }

  /** Apply one micro-batch of entity events to the current table state.
    *
    * Events carry a `kind` ("add"/"sale" = insert, "edit", "remove")
    * and a `seq` long (Kafka offset / arrival order) defining the
    * replay order per key. Semantics = sequential replay, made
    * set-oriented:
    *
    *  - the LAST effective event per key wins, deterministically by
    *    (seq, kind) — round 1's `dropDuplicates` kept an arbitrary row;
    *  - an edit applies only if the key exists at that point — present
    *    in `current`, or created/removed by the latest preceding
    *    existence event (add/remove) within the batch. Edit on a
    *    missing key is a silent no-op, exactly the reference
    *    (`kafka_consumer.py:153–155` masks on an absent key and writes
    *    nothing);
    *  - remove of a missing key is naturally a no-op; an add for an
    *    existing key replaces the row (documented deviation: the
    *    reference's producer-side duplicate gate makes this unreachable
    *    there).
    *
    * One window pass over the batch partitioned by key + one key-level
    * join against `current` — no driver work, scales with executors.
    */
  def applyEvents(current: DataFrame, events: DataFrame, key: String): DataFrame = {
    val dataCols = current.columns
    val wSeq = Window.partitionBy(col(key)).orderBy(col("seq"), col("kind"))
    val curKeys = current.select(col(key)).distinct()
      .withColumn("_in_current", lit(true))
    val annotated = events
      // 1 = key exists after this event, 0 = gone; null for edits
      .withColumn("_exist_change",
        when(col("kind") === "remove", lit(0))
          .when(col("kind") =!= "edit", lit(1)))
      .withColumn("_prev_exist",
        last(col("_exist_change"), ignoreNulls = true)
          .over(wSeq.rowsBetween(Window.unboundedPreceding, -1)))
      .join(curKeys, Seq(key), "left")
      .withColumn("_exists_before",
        coalesce(col("_prev_exist") === 1, col("_in_current"), lit(false)))
    val effective = annotated
      .filter(col("kind") =!= "edit" || col("_exists_before"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key))
          .orderBy(col("seq").desc, col("kind").desc)))
      .filter(col("_rn") === 1)
    val upserts = effective.filter(col("kind") =!= "remove")
      .select(dataCols.map(col).toIndexedSeq: _*)
    val removes = effective.filter(col("kind") === "remove")
      .select(col(key))
    PosOps.upsert(current, upserts, key)
      .join(removes, Seq(key), "left_anti")
  }

  /** S5 — the real Kafka source: ONE stream subscribed to all 9 topics
    * (the reference runs 9 daemon threads each polling its own
    * `KafkaConsumer`, kafka_consumer.py:379–409), normalized to the
    * (topic, value, seq) shape the rest of the pipeline consumes. The
    * per-partition Kafka offset is the replay order. Kafka-specific
    * wiring is isolated here; everything downstream is testable
    * brokerless via MemoryStream.
    */
  def kafkaSource(
      spark: SparkSession,
      bootstrapServers: String,
      topics: Seq[String] = saleTopics ++ productTopics ++ customerTopics,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics.mkString(","))
      .option("startingOffsets", startingOffsets)
      .load()
      .select(
        col("topic"),
        col("value").cast("string").as("value"),
        col("offset").as("seq"))

  /** S6 — rows → Kafka payload: every column JSON-encoded into `value`
    * with the destination `topic` attached, the producer's
    * `json.dumps(...).encode` serialization (kafka_producer.py:23–26).
    */
  def toKafkaPayload(df: DataFrame, topic: String): DataFrame =
    df.select(
      lit(topic).as("topic"),
      to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))

  /** S6 — batch Kafka sink (`producer.send` + flush,
    * kafka_producer.py:138–139). Executors publish partition-parallel.
    */
  def writeToKafka(df: DataFrame, bootstrapServers: String, topic: String): Unit =
    toKafkaPayload(df, topic).write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .save()

  /** Streaming variant of the Kafka sink (`writeStream` + checkpoint). */
  def streamToKafka(
      df: DataFrame,
      bootstrapServers: String,
      topic: String,
      checkpoint: String): StreamingQuery =
    toKafkaPayload(df, topic).writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("checkpointLocation", checkpoint)
      .start()

  /** End-to-end EP3: Kafka → parse/route → table store. */
  def startIngestFromKafka(
      spark: SparkSession,
      bootstrapServers: String,
      store: TableStore,
      checkpoint: String): StreamingQuery =
    startIngest(spark, kafkaSource(spark, bootstrapServers), store, checkpoint)

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
  def applyMicroBatch(spark: SparkSession, rawBatch: DataFrame, store: TableStore): Unit = {
    val batch = withSeq(rawBatch)
    batch.persist()
    try {
      // --- sales: assign ids to inserts, then upsert/remove ---
      val saleEvents = parseEntity(batch, saleTopics, saleSchema)
      if (!saleEvents.isEmpty) {
        val current = store.read(spark, "sales", saleSchema)
        val maxId = current.agg(coalesce(max(col("sale_id")), lit(0L)))
          .head().getLong(0)
        // ids in arrival order (seq), the reference's consumption-order
        // counter semantics (kafka_consumer.py:74–109)
        val inserts = assignSaleIds(
          saleEvents.filter(col("kind") === "sale").drop("sale_id"),
          maxId, Seq("seq"))
          .select((Seq("kind", "seq") ++ saleSchema.fieldNames).map(col): _*)
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

package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.ops.PosOps
import graft.sinks.{JdbcUpsertSink, PostgresUpsertDialect, UpsertDialect}
import graft.sources.JdbcSource

/** EP1 — the daily append-only load (`airflow/dags/POS_spark_dag.py:
  * 85–120`): read the day's extract, dropna + full-row dedup (the
  * explicit-schema read replaces the reference's cast chain), append
  * into the warehouse. One Spark write action, executor-parallel, no
  * driver detours. Returns false on an empty extract (the reference's
  * `df.rdd.isEmpty()` guard, POS_spark_dag.py:91).
  */
object DailyLoadJob {
  def run(
      extract: DataFrame,
      url: String,
      table: String,
      props: Map[String, String] = Map.empty): Boolean = {
    val cleaned = PosOps.cleanLoad(extract)
    if (cleaned.isEmpty) false
    else { JdbcSource.append(cleaned, url, table, props); true }
  }
}

/** EP2 — the hourly incremental sync (`POS_spark_dag.py:124–201`):
  * snapshot the warehouse table over JDBC, left-anti join against the
  * fresh extract to find deletions, then DELETE + UPSERT — both
  * executor-parallel through [[JdbcUpsertSink]], where the reference
  * `collect()`s the delete keys AND every fresh row to one Python
  * process (POS_spark_dag.py:164, :172).
  */
class HourlySyncJob(
    url: String,
    connProps: java.util.Properties = new java.util.Properties,
    dialect: UpsertDialect = PostgresUpsertDialect,
    readProps: Map[String, String] = Map.empty) extends Serializable {

  /** Warehouse ← fresh, for one table: delete stale keys, upsert all
    * fresh rows (M3 full-sync semantics).
    *
    * `snapshotScope` is the SURVEY §7.4.3 decision made explicit. The
    * reference anti-joins its FULL warehouse snapshot against only the
    * recently-modified files (`POS_spark_dag.py:155` vs :125–146), so
    * rows living in unmodified files get deleted — bug-compatible
    * parity is `None`. Passing a predicate (e.g. the date/category
    * partitions actually being synced) scopes the deletion to rows the
    * fresh extract can speak for — the corrected mode.
    */
  def syncTable(
      spark: SparkSession,
      table: String,
      key: String,
      fresh: DataFrame,
      snapshotScope: Option[Column] = None): Unit = {
    val full = JdbcSource.read(spark, url, table, readProps)
      .select(fresh.columns.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq: _*)
    val snapshot = snapshotScope.fold(full)(full.filter)
    new JdbcUpsertSink(url, table, Seq(key), connProps, dialect = dialect)
      .sync(snapshot, fresh)
  }

  /** The whole hourly run — the reference's `all_update_data`
    * (`POS_spark_dag.py:417–421`) composed behind one entry point:
    * transactions, then products, then enriched customers, in that
    * order. Ordering is semantic, not incidental: the customer
    * enrichment reads the **warehouse** sales table
    * (`POS_spark_dag.py:365`, `:396`), so it must observe the
    * transactions sync that just ran. Tier thresholds and aggregation
    * columns default to the reference's (`POS_spark_dag.py:374–383`:
    * sum of total_price, buckets at 100/500/2000; frequency counts
    * sale_id, `:405–406`).
    */
  def runAll(
      spark: SparkSession,
      freshSales: DataFrame,
      freshProducts: DataFrame,
      freshCustomers: DataFrame,
      salesTable: String = "sales",
      productsTable: String = "products",
      customersTable: String = "customers",
      saleKey: String = "sale_id",
      productKey: String = "product_id",
      custKey: String = "customer_id",
      amount: Column = org.apache.spark.sql.functions.col("total_price"),
      countCol: String = "sale_id",
      bronzeBelow: Double = 100,
      silverBelow: Double = 500,
      goldBelow: Double = 2000): Unit = {
    syncTable(spark, salesTable, saleKey, freshSales)
    syncTable(spark, productsTable, productKey, freshProducts)
    val warehouseSales = JdbcSource.read(spark, url, salesTable, readProps)
    syncEnrichedCustomers(spark, customersTable, custKey, freshCustomers,
      warehouseSales, amount, countCol, bronzeBelow, silverBelow, goldBelow)
  }

  /** The customers variant (`POS_spark_dag.py:281–362`): fresh customer
    * rows are first enriched with membership tier and purchase
    * frequency from the sales fact — ONE pass computing sum+count fused
    * (the reference scans sales twice over JDBC, :366 and :396) — then
    * synced like any other table.
    */
  def syncEnrichedCustomers(
      spark: SparkSession,
      table: String,
      custKey: String,
      freshCustomers: DataFrame,
      sales: DataFrame,
      amount: Column,
      countCol: String,
      bronzeBelow: Double,
      silverBelow: Double,
      goldBelow: Double): Unit = {
    val enriched = PosOps.enrichCustomers(
      freshCustomers, sales, custKey, amount, countCol,
      bronzeBelow, silverBelow, goldBelow)
    syncTable(spark, table, custKey, enriched)
  }
}

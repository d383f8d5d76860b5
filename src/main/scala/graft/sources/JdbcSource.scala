package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC snapshot source (S3) — the reference opens every hourly sync
  * with `load_postgresql` (`airflow/dags/POS_spark_dag.py:44–52`), a
  * single-connection whole-table read.
  *
  * Scale: a plain JDBC read is one connection/one partition; for large
  * warehouse tables pass `partitioning` so Spark issues
  * `numPartitions` parallel range-predicated reads
  * (`partitionColumn/lowerBound/upperBound` — the standard parallel
  * JDBC scan). Dimension-sized tables can omit it.
  */
object JdbcSource {

  /** Range partitioning spec for parallel reads. */
  final case class RangePartitioning(
      column: String, lower: Long, upper: Long, numPartitions: Int)

  def read(
      spark: SparkSession,
      url: String,
      table: String,
      props: Map[String, String] = Map.empty,
      partitioning: Option[RangePartitioning] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val withProps = props.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
    val withParts = partitioning.fold(withProps) { p =>
      withProps
        .option("partitionColumn", p.column)
        .option("lowerBound", p.lower)
        .option("upperBound", p.upper)
        .option("numPartitions", p.numPartitions)
    }
    withParts.load()
  }

  /** JDBC append sink (S4) — `df.write.format("jdbc").mode("append")`,
    * the reference's daily-load landing write
    * (`POS_spark_dag.py:108–117`). Executors write partition-parallel.
    */
  def append(
      df: DataFrame,
      url: String,
      table: String,
      props: Map[String, String] = Map.empty): Unit = {
    val base = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    props.foldLeft(base) { case (w, (k, v)) => w.option(k, v) }
      .mode("append")
      .save()
  }
}

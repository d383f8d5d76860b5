package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal versioned parquet table store: mutable-table semantics on
  * immutable files (SURVEY §7.4.2).
  *
  * Each `overwrite` writes a brand-new `v=N` directory and then flips
  * a `_latest` pointer file — readers never observe a half-written
  * table, replacing the reference's racy whole-CSV rewrites
  * (kafka_consumer.py:106 ↔ 117). This is the smallest possible
  * version-pointer design (what table formats like Iceberg/Delta do
  * with manifests); single-writer per table is assumed, as in the
  * streaming ingest where `foreachBatch` serializes batches.
  */
class TableStore(root: String) {

  private def tableDir(name: String): Path = Paths.get(root, name)
  private def pointer(name: String): Path = tableDir(name).resolve("_latest")

  def currentVersion(name: String): Option[Long] = {
    val p = pointer(name)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Read the current version; empty DataFrame with the given schema if
    * the table does not exist yet.
    */
  def read(spark: SparkSession, name: String, schema: StructType): DataFrame =
    currentVersion(name) match {
      case Some(v) =>
        spark.read.parquet(tableDir(name).resolve(s"v=$v").toString)
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Write a new version and atomically flip the pointer.
    *
    * `sortBy` (O2): the reference keeps its CSV files key-ordered on
    * every rewrite (`kafka_consumer.py:103, 221, 313`). A global sort
    * is dead weight at scale, so the engine's equivalent is opt-in and
    * per-partition (`sortWithinPartitions` — no extra shuffle, files
    * are internally ordered for locality/compression).
    */
  /** `partitionBy` (§1 data model): hive-style directory partitioning
    * — the engine's form of the reference's per-day sales files and
    * per-category product files (kafka_consumer.py:82–83, 41–49).
    * Readers filtering on the partition column scan only matching
    * directories (partition pruning; asserted in IngestSpec).
    */
  def overwrite(
      name: String,
      df: DataFrame,
      sortBy: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil): Unit = {
    val next = currentVersion(name).getOrElse(0L) + 1
    val dest = tableDir(name).resolve(s"v=$next")
    val toWrite =
      if (sortBy.isEmpty) df
      else df.sortWithinPartitions(sortBy.map(df.col): _*)
    toWrite.write.mode("overwrite")
      .partitionBy(partitionBy: _*)
      .parquet(dest.toString)
    val tmp = tableDir(name).resolve("_latest.tmp")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer(name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // retire old versions (keep previous for in-flight readers);
    // directory streams are closed explicitly — round 1 leaked one fd
    // per GC pass
    currentVersion(name).foreach { cur =>
      val dir = tableDir(name)
      if (Files.exists(dir)) {
        val listing = Files.list(dir)
        try {
          listing.filter(p => p.getFileName.toString.startsWith("v="))
            .filter(p => p.getFileName.toString.drop(2).toLong < cur - 1)
            .forEach { p =>
              val walk = Files.walk(p)
              try walk.sorted(Comparator.reverseOrder[Path]())
                .forEach(f => Files.deleteIfExists(f))
              finally walk.close()
            }
        } finally listing.close()
      }
    }
  }
}

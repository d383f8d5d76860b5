package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed table layout — the storage-level answer to repeated
  * same-key joins and aggregations.
  *
  * `bucketBy(n, keys)` hash-partitions rows into `n` files per
  * partition by the key AT WRITE TIME and records the layout in the
  * catalog. Every later equi-join or aggregation on those keys then
  * satisfies its required child distribution straight off the scan:
  * NO Exchange on the bucketed side(s), which at 100 TB is the
  * difference between re-shuffling the fact table for every query and
  * shuffling it once, ever (and when both join sides share the bucket
  * spec, the join is fully co-located — proven shuffle-free in
  * BucketedSpec). `sortBy` additionally pre-orders within buckets so a
  * sort-merge join skips its sort.
  *
  * This composes with [[graft.streaming.TableStore]]'s snapshot
  * versioning conceptually but lives in the session catalog — the
  * catalog is what carries the bucket metadata to the planner; a bare
  * parquet directory cannot (Spark ignores bucket files it cannot
  * attribute, so always read bucketed data via the table name).
  *
  * Sizing: buckets ~= target parallelism for the table's heaviest
  * join; each bucket should land in the 100 MB–1 GB compressed range
  * at production scale. Too few buckets caps join parallelism, too
  * many makes small files.
  */
object Bucketed {

  /** Write `df` as a bucketed external parquet table at `path`,
    * registered as `table` in the session catalog (replacing any
    * previous definition).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketKeys: Seq[String],
      buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketKeys.nonEmpty, "bucketKeys must be non-empty")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // saveAsTable parses the name as a dot-separated multi-part
    // identifier; the drop must resolve the SAME identifier, so parse
    // with the session's own SQL parser (which honors backtick quoting
    // — a naive split('.') would mangle db.`my.table`) and re-quote
    // each parsed part, escaping embedded backticks
    val quoted = df.sparkSession.sessionState.sqlParser
      .parseMultipartIdentifier(table)
      .map(p => "`" + p.replace("`", "``") + "`").mkString(".")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $quoted")
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketKeys.head, bucketKeys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }
}

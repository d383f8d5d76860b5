package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Sorted write layout must buy parquet row-group skipping: a range
  * predicate on the sort key reads only the row groups whose min/max
  * stats overlap the range, while the same data written in shuffled
  * order reads everything. This is the storage-layout half of the
  * 100 TB scan story (bucketing covers the join half): sorting by the
  * dominant filter key at write time turns point/range queries from
  * full scans into a handful of row groups, with zero reader-side
  * configuration — the stats live in the parquet footers.
  */
class LayoutSkippingSpec extends SparkTestBase {
  import spark.implicits._

  private def scanOutputRows(
      df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    // collect (not count) so the metrics read below belong to THIS
    // query execution
    val resultRows = df.collect().length.toLong
    def leafScan(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => leafScan(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(leafScan)
      }
    val scanned = leafScan(df.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
    (resultRows, scanned)
  }

  test("range filter on a sorted layout skips row groups; shuffled layout scans all") {
    val dir = Files.createTempDirectory("graft_skip").toString
    val n = 200000
    // small row groups so the file holds many of them
    val rows = (1 to n).map(i => (i.toLong, s"payload_$i"))
    try {
      rows.toDF("k", "payload")
        .orderBy("k").coalesce(1)
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(s"$dir/sorted")
      // same rows, key order destroyed: every row group spans the
      // whole key range, so min/max stats can never exclude one
      rows.toDF("k", "payload")
        .orderBy(md5(col("payload"))).coalesce(1)
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(s"$dir/shuffled")

      val pred = col("k").between(1000, 2000)
      val (sortedRows, sortedRead) = scanOutputRows(
        spark.read.parquet(s"$dir/sorted").filter(pred))
      val (shuffledRows, shuffledRead) = scanOutputRows(
        spark.read.parquet(s"$dir/shuffled").filter(pred))

      // both return identical results...
      assert(sortedRows == 1001L && shuffledRows == 1001L)
      // ...but the sorted layout decodes a small fraction of the rows
      // (only the overlapping row groups), the shuffled layout all of
      // them — numOutputRows counts rows surviving the scan's own
      // row-group pruning, before the post-scan filter
      assert(shuffledRead == n.toLong,
        s"shuffled layout unexpectedly skipped: $shuffledRead")
      assert(sortedRead < n / 10,
        s"sorted layout did not skip row groups: $sortedRead of $n")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}

package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.streaming.TableStore

/** Targeted small-file compaction: fragmented partitions bin-pack to
  * few files, healthy partitions carry forward by reference, contents
  * are bit-identical, and the publish rides the normal CAS path.
  */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType),
    StructField("day", StringType)))

  private def freshStore(): (TableStore, Path) = {
    val root = Files.createTempDirectory("graft_compact")
    (new TableStore(root.toString, keepVersions = 3), root)
  }

  /** The files the LIVE snapshot actually reads for one partition —
    * retired-but-retained version dirs (keepVersions time travel)
    * must not count.
    */
  private def partFiles(store: TableStore, day: String): Seq[Path] =
    store.read(spark, "t", schema, Some(Seq(day)))
      .inputFiles.toSeq.map(f => Paths.get(f.stripPrefix("file:")))

  test("fragmented partitions bin-pack; healthy ones carry by reference") {
    val (store, _) = freshStore()
    // day=a: 8 files of tiny rows (fragmented); day=b: 1 file (healthy)
    val dfA = (0L until 800L).map(i => (i, i * 7L, "a"))
      .toDF("k", "v", "day").repartition(8)
    val dfB = (0L until 100L).map(i => (i, i * 3L, "b"))
      .toDF("k", "v", "day").coalesce(1)
    store.overwrite("t", dfA.unionByName(dfB), partitionBy = Seq("day"))
    assert(partFiles(store, "a").size >= 5, "fixture must fragment")
    val bFilesBefore = partFiles(store, "b").map(_.toString).toSet
    val before = store.read(spark, "t", schema)
      .as[(Long, Long, String)].collect().sorted.toSeq

    val compacted = store.compactSmallFiles(spark, "t", schema,
      targetBytes = 1L << 30, maxFilesPerPartition = 4)
    assert(compacted == Seq("a"), s"wrong selection: $compacted")

    // a: bin-packed to ceil(bytes/1GiB) = 1 file
    assert(partFiles(store, "a").size == 1,
      s"expected 1 packed file, got ${partFiles(store, "a")}")
    // b: the SAME physical files (carried by reference, not rewritten)
    assert(partFiles(store, "b").map(_.toString).toSet == bFilesBefore,
      "healthy partition was rewritten")
    // contents identical
    val after = store.read(spark, "t", schema)
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(after == before, "compaction changed table contents")
    // idempotent: a healthy table compacts nothing
    assert(store.compactSmallFiles(spark, "t", schema,
      targetBytes = 1L << 30, maxFilesPerPartition = 4).isEmpty)
  }

  test("targetBytes splits a large fragmented partition into n files") {
    val (store, _) = freshStore()
    val df = (0L until 20000L).map(i => (i, i, "a"))
      .toDF("k", "v", "day").repartition(10)
    store.overwrite("t", df, partitionBy = Seq("day"))
    val bytes = partFiles(store, "a").map(Files.size(_)).sum
    val target = bytes / 3 + 1 // => ceil(bytes/target) = 3 buckets
    store.compactSmallFiles(spark, "t", schema,
      targetBytes = target, maxFilesPerPartition = 4)
    val n = partFiles(store, "a").size
    assert(n >= 1 && n <= 3, s"expected 1..3 packed files, got $n")
    assert(store.read(spark, "t", schema).count() == 20000L)
  }

  test("unpartitioned tables refuse targeted compaction") {
    val (store, _) = freshStore()
    store.overwrite("t", Seq((1L, 2L, "a")).toDF("k", "v", "day"))
    intercept[IllegalArgumentException] {
      store.compactSmallFiles(spark, "t", schema, targetBytes = 1L << 20)
    }
    // absent table: quiet no-op
    assert(store.compactSmallFiles(spark, "missing", schema,
      targetBytes = 1L << 20).isEmpty)
  }
}

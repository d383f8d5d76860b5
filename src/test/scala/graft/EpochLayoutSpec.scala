package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.ops.Sampling
import graft.streaming.TableStore

/** The training-epoch layout. [[Sampling.deterministicShuffle]]'s
  * contract says "reading the result back in file order replays the
  * epoch" — q_corpus_shuffle exercises only the limit-k prefix
  * (TakeOrderedAndProject), so this spec proves the FULL-ORDER form
  * through the engine's own TableStore: the shuffled corpus is
  * persisted, and concatenating the snapshot's part files in file-name
  * order reproduces the oracle order exactly. That is the property a
  * resumable pretraining run relies on: the epoch order lives in the
  * LAYOUT, so replay (or resume at file k) needs no sort at read time.
  */
class EpochLayoutSpec extends SparkTestBase {

  /** At test scale AQE coalesces the whole range shuffle into one
    * partition (correct — the data is tiny); the multi-file layout
    * claim needs several range partitions, so pin coalescing off for
    * the write, as a 100 TB run's partitions would naturally be many.
    */
  private def withMultiPartWrite[A](body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  /** The store's parquet part files in file-name order; the walk
    * stream is closed (it holds directory handles open otherwise). */
  private def partFiles(root: String): Seq[Path] = {
    val walk = Files.walk(java.nio.file.Paths.get(root))
    try walk.iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-") &&
        p.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.getFileName.toString)
    finally walk.close()
  }

  test("a shuffled corpus persisted to the TableStore replays in file order") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source")
    val root = Files.createTempDirectory("epoch_store").toString
    val store = new TableStore(root)
    withMultiPartWrite {
      store.overwrite("epoch_0",
        Sampling.deterministicShuffle(docs, col("doc_id")))
    }

    // the snapshot's data files in file-name order (part-00000 … is
    // the range-partition order; one table, one version under root)
    val files = partFiles(root)
    // cross-file ordering is the claim under test — a single file
    // would prove only intra-file sorting
    assert(files.size >= 2, s"expected a multi-file epoch, got $files")

    // each small file is one read split, so collect() preserves its
    // row order; concatenation in file order is the epoch replay
    val replayed = files.flatMap { f =>
      spark.read.parquet(f.toString).select("doc_id", "source")
        .collect().map(r => (r.getLong(0), r.getString(1)))
    }
    val oracle = docs
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy { case (id, _, h) => (h, id) }
      .map { case (id, s, _) => (id, s) }
      .toSeq
    assert(replayed == oracle,
      s"file-order replay diverged from the oracle epoch order " +
        s"(first few: ${replayed.take(3)} vs ${oracle.take(3)})")
  }

  test("resume-at-file-k replays the epoch suffix") {
    // the mid-epoch resume story: a run that consumed the first k
    // files resumes by reading the REMAINING files in name order —
    // no sort, no offset bookkeeping below file granularity
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id")
    val root = Files.createTempDirectory("epoch_store2").toString
    val store = new TableStore(root)
    withMultiPartWrite {
      store.overwrite("epoch_0",
        Sampling.deterministicShuffle(docs, col("doc_id")))
    }
    val files = partFiles(root)
    assert(files.size >= 2)
    val perFile = files.map(f =>
      spark.read.parquet(f.toString).select("doc_id")
        .collect().map(_.getLong(0)).toSeq)
    val full = perFile.flatten
    val resumed = perFile.drop(1).flatten
    assert(resumed == full.drop(perFile.head.size),
      "suffix replay diverged from the full epoch order")
  }
}

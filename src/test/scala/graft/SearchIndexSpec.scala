package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.TableStore
import graft.text.{SearchIndex, TextOps}

class SearchIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple apple banana cherry"),
    (2L, "banana date date date"),
    (3L, "egg fig grape"),
    (4L, "apple banana egg fig"),
    (5L, "date grape apple"))
  private val queries = Seq(("qA", "apple banana"), ("qB", "egg"))

  private def newStore(tag: String) =
    new TableStore(Files.createTempDirectory(s"graft_sidx_$tag").toString)

  test("indexed search equals the live operator, score for score") {
    val docs = corpus.toDF("doc_id", "text")
    val qs = queries.toDF("qid", "qtext")
    val store = newStore("eq")
    SearchIndex.build(store, "docs", docs, "doc_id", "text", nBuckets = 16)
    val live = TextOps.bm25Search(docs, "doc_id", "text",
        qs, "qid", "qtext", k = 3)
      .collect().map(_.toSeq).toSet
    val indexed = SearchIndex.search(spark, store, "docs",
        qs, "qid", "qtext", k = 3)
      .collect().map(_.toSeq).toSet
    assert(indexed == live, "persisted-index scores diverged from live")
  }

  test("incremental addDocuments equals a full rebuild") {
    val old = corpus.filter(_._1 <= 3).toDF("doc_id", "text")
    val fresh = corpus.filter(_._1 > 3).toDF("doc_id", "text")
    val qs = queries.toDF("qid", "qtext")
    val inc = newStore("inc")
    SearchIndex.build(inc, "docs", old, "doc_id", "text", nBuckets = 16)
    SearchIndex.addDocuments(inc, "docs", fresh, "doc_id", "text")
    val full = newStore("full")
    SearchIndex.build(full, "docs", corpus.toDF("doc_id", "text"),
      "doc_id", "text", nBuckets = 16)
    val a = SearchIndex.search(spark, inc, "docs", qs, "qid", "qtext")
      .collect().map(_.toSeq).toSet
    val b = SearchIndex.search(spark, full, "docs", qs, "qid", "qtext")
      .collect().map(_.toSeq).toSet
    assert(a == b, "incrementally-merged index diverged from rebuild")
    // meta scalars advanced exactly
    val meta = inc.readMeta("docs_postings")
    assert(meta("n_docs").toLong == 5L)
  }

  test("search reads ONLY the query terms' posting buckets") {
    val docs = corpus.toDF("doc_id", "text")
    val store = newStore("prune")
    SearchIndex.build(store, "docs", docs, "doc_id", "text", nBuckets = 16)
    val oneTerm = Seq(("q", "egg")).toDF("qid", "qtext")
    val res = SearchIndex.search(spark, store, "docs",
      oneTerm, "qid", "qtext")
    val postingDirs = res.inputFiles.toSeq
      .filter(_.contains("docs_postings"))
      .flatMap("bucket=([0-9]+)".r.findFirstMatchIn(_)).map(_.group(1))
      .toSet
    val want = spark.range(1)
      .select(pmod(xxhash64(lit("egg")), lit(16L)).cast("string"))
      .head().getString(0)
    assert(postingDirs == Set(want),
      s"probe touched buckets $postingDirs, expected only $want")
  }
}

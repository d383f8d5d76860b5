package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Bucketed

/** Bucketed tables must feed same-key joins and aggregations without
  * an Exchange — the co-location contract that makes the layout worth
  * its write cost at scale. Verified against the executed (AQE-final)
  * physical plan, with broadcast disabled so a shuffle would have to
  * show up as Exchange hashpartitioning if the bucket layout were ignored.
  */
class BucketedSpec extends SparkTestBase {
  import spark.implicits._

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan.toString
  }

  test("both-sides-bucketed join and bucket-key aggregation are shuffle-free") {
    val dir = Files.createTempDirectory("graft_bucketed").toString
    val facts = (1 to 5000).map(i => (i.toLong % 97, i.toLong, i * 1.5))
      .toDF("k", "row_id", "amount")
    val dims = (0L until 97L).map(k => (k, s"dim_$k")).toDF("k", "name")
    try {
      Bucketed.writeBucketed(facts, "b_facts", s"$dir/facts",
        Seq("k"), 8, sortCols = Seq("k"))
      Bucketed.writeBucketed(dims, "b_dims", s"$dir/dims",
        Seq("k"), 8, sortCols = Seq("k"))

      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
        val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
        val plan = finalPlan(joined)
        assert(plan.contains("SortMergeJoin"))
        assert(!plan.contains("Exchange hashpartitioning"),
          s"co-located join still shuffles:\n$plan")
        assert(joined.count() == 5000)

        val agg = spark.table("b_facts").groupBy("k")
          .agg(sum("amount").as("total"))
        val aggPlan = finalPlan(agg)
        assert(!aggPlan.contains("Exchange hashpartitioning"),
          s"bucket-key aggregation still shuffles:\n$aggPlan")
        assert(agg.count() == 97)
      }

      // same data, plain (unbucketed) tables: the join DOES shuffle —
      // proves the assertion above is observing the bucket layout,
      // not some quirk that makes every plan exchange-free
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val plain = facts.join(dims, "k")
        assert(finalPlan(plain).contains("Exchange hashpartitioning"))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("bucketed scan prunes buckets for a point lookup on the bucket key") {
    val dir = Files.createTempDirectory("graft_bucketed2").toString
    val facts = (1 to 5000).map(i => (i.toLong % 97, i.toLong))
      .toDF("k", "row_id")
    try {
      Bucketed.writeBucketed(facts, "b_prune", s"$dir/t", Seq("k"), 8)
      // DisableUnnecessaryBucketedScan would drop the bucketed read for
      // a bare filter (no distribution requirement); force it on to
      // observe the pruning behavior
      val plan = withConf(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
        finalPlan(spark.table("b_prune").filter(col("k") === 5L))
      }
      val q = spark.table("b_prune").filter(col("k") === 5L)
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"no bucket pruning in:\n$plan")
      assert(q.count() == facts.filter(col("k") === 5L).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_prune")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("a bucketed fingerprint index verifies bloom residue with zero index exchange") {
    // THE corpus-scale shape for Dedup.exactAgainstCorpus: a 10¹⁰-doc
    // fp index is far past any broadcast threshold, so an unbucketed
    // verify join would sort-merge — shuffling the WHOLE index per
    // ingested batch. Stored fp-bucketed, the index side satisfies
    // the join distribution straight off the scan: the only Exchange
    // left is the (tiny) residue's own, and the downstream
    // (batch_doc, fp) aggregation free-rides on the join's fp
    // distribution. Broadcast is disabled to expose exactly what a
    // too-big-to-broadcast index would do.
    import graft.dedup.Dedup
    val dir = Files.createTempDirectory("graft_bucketed3").toString
    val corpus = (1L to 500L)
      .map(i => (i, s"corpus document number $i body")).toDF("doc_id", "text")
    val batch = Seq(
      (1001L, "corpus document number 7 body"), // known
      (1002L, "a genuinely new document body")) // new
      .toDF("doc_id", "text")
    try {
      Bucketed.writeBucketed(
        Dedup.exactFingerprintIndex(corpus, "doc_id", "text"),
        "b_fp_index", s"$dir/fp", Seq("fp"), 8)
      val index = spark.table("b_fp_index")
      val bloom = Dedup.exactBloomIndex(index)
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
        val report = Dedup.exactAgainstCorpus(
          batch, index, "doc_id", "text", Some(bloom))
        // count in the FINAL section only (AQE appends the pre-AQE
        // "Initial Plan", which would double-count the exchange)
        val full = finalPlan(report)
        val cut = full.indexOf("== Initial Plan ==")
        val plan = if (cut >= 0) full.substring(0, cut) else full
        val exchanges = "Exchange hashpartitioning".r
          .findAllMatchIn(plan).length
        assert(exchanges == 1,
          s"expected ONE exchange (the residue's), got $exchanges:\n$plan")
        val got = report.collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
        assert(got == Map(1001L -> Some(7L), 1002L -> None))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_fp_index")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.streaming.{CorpusIngest, TableStore}

/** End-to-end streaming corpus ingest: dirty document feed in, clean
  * stored corpus out — quality gate, cross-batch exact dedup
  * (checkpointed state), benchmark decontamination, epoch-partitioned
  * persist.
  */
class CorpusIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("dirty feed → quality-gated, deduplicated, decontaminated corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val bench = Seq((900L, "leak mark alpha beta gamma delta end"))
      .toDF("doc_id", "text")
    val store = new TableStore(tmp("corpus_store"))
    val good1 = "one two three four five six seven eight nine ten eleven"
    val good2 = "red orange yellow green blue indigo violet amber teal cyan"
    val leaked = "payload with leak mark alpha beta gamma delta inside " +
      "plus enough filler tokens to pass the gate easily"
    val ms = MemoryStream[(Long, String)]
    val q = CorpusIngest.start(
      spark, ms.toDF().toDF("doc_id", "text"), bench,
      store, "corpus", tmp("corpus_ckpt"))
    try {
      ms.addData(
        (1L, good1),
        (2L, "too short"),          // fails the ≥10-token quality gate
        (3L, good1),                // in-batch exact dup of 1
        (4L, leaked))               // shares a 4-gram with the benchmark
      q.processAllAvailable()
      ms.addData(
        (5L, good1),                // cross-batch dup of 1 — state drops it
        (6L, good2))                // genuinely new
      q.processAllAvailable()

      val got = CorpusIngest.corpus(spark, store, "corpus")
        .select("doc_id", "text", "ingest_batch")
        .as[(Long, String, String)].collect()
      // content-level: exactly one copy of each distinct good text.
      // Which of the two same-fingerprint rows (doc 1 vs 3) survives is
      // whichever the group iterator yields first — intra-group order
      // is not a flatMapGroupsWithState guarantee — so assert on
      // fingerprint-level outcomes, not on the winning doc_id
      assert(got.map(_._2).sorted.toSeq == Seq(good1, good2).sorted,
        s"expected one copy each of the clean uniques, got $got")
      val doc1 = got.find(_._2 == good1).get
      val doc6 = got.find(_._2 == good2).get
      assert(Set(1L, 3L).contains(doc1._1) && doc6._1 == 6L)
      assert(doc1._3 != doc6._3,
        "survivors of different epochs live in different partitions")

      // replaying an epoch's batch rewrites its partition, not appends:
      // table contents are exactly-once under at-least-once delivery
      val epoch1 = doc6._3.toLong
      CorpusIngest.applyBatch(spark,
        Seq(("fp6", 6L, good2)).toDF("fp", "doc_id", "text"),
        bench, store, "corpus", epoch1)
      val replayed = CorpusIngest.corpus(spark, store, "corpus")
        .groupBy(col("doc_id")).count()
        .as[(Long, Long)].collect().toMap
      assert(replayed == Map(doc1._1 -> 1L, 6L -> 1L),
        s"replay duplicated rows: $replayed")
    } finally q.stop()
  }

  test("a learned score gate composes into the streaming prefix") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.text.QualityModel

    // train a long-form discriminator on a synthetic batch frame —
    // same weak-label bootstrap as q_quality_model
    val trainDocs = (1 to 120).map { i =>
      val n = 5 + (i % 56)
      (i.toLong, (0 until n).map(j => s"w${(i + j) % 7}").mkString(" "))
    }.toDF("doc_id", "text")
    val feats = QualityModel.features(col("text"))
    val w = QualityModel.train(trainDocs, feats,
      (graft.text.TextOps.tokenCount(col("text")) >= 30).cast("double"),
      iters = 15, lr = 0.8)
    val score = QualityModel.scoreColumn(feats, w)

    // drawn from the training generator's distribution (a learned
    // gate is only meaningful in-distribution); 12 tokens passes the
    // ≥10-token RULE gate but is far below the ≥30 long-form boundary
    val shortish = (0 until 12).map(j => s"w${(3 + j) % 7}").mkString(" ")
    val longform = (0 until 45).map(j => s"w${(5 + j) % 7}").mkString(" ")
    val ms = MemoryStream[(Long, String)]
    val out = CorpusIngest.cleanStream(
      spark, ms.toDF().toDF("doc_id", "text"), Some((score, 0.5)))
    val q = out.toDF("fp", "doc_id", "text").writeStream
      .format("memory").queryName("score_gated")
      .option("checkpointLocation", tmp("score_gate_ckpt"))
      .outputMode("append").start()
    try {
      ms.addData((1L, shortish), (2L, longform))
      q.processAllAvailable()
      val got = spark.table("score_gated")
        .select("doc_id").as[Long].collect().toSet
      // the 12-token doc passes the ≥10-token RULE gate but scores low;
      // only the long-form doc survives the model gate — and the
      // streaming outcome equals the batch filter on the same column
      assert(got == Set(2L), s"score gate kept $got")
      val batchKept = Seq((1L, shortish), (2L, longform))
        .toDF("doc_id", "text")
        .filter(graft.text.TextOps.qualityOk(col("text")) && score >= 0.5)
        .select("doc_id").as[Long].collect().toSet
      assert(batchKept == got, "stream and batch gates disagree")
    } finally q.stop()
  }

  test("an all-dropped batch leaves the corpus unchanged and replayable") {
    val store = new TableStore(tmp("corpus_store2"))
    val bench = Seq((900L, "a b c d")).toDF("doc_id", "text")
    val keep = Seq(("fpx", 1L, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11"))
      .toDF("fp", "doc_id", "text")
    CorpusIngest.applyBatch(spark, keep, bench, store, "corpus", 0L)
    // epoch 1 arrives but every row was gated/deduped upstream
    CorpusIngest.applyBatch(spark,
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("fp",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))),
      bench, store, "corpus", 1L)
    val got = CorpusIngest.corpus(spark, store, "corpus")
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("periodic compaction collapses cross-epoch near-dups and folds versions") {
    val store = new TableStore(tmp("corpus_store4"))
    val bench = Seq((900L, "a b c d")).toDF("doc_id", "text")
    val base = (1 to 30).map(j => s"tok$j").mkString(" ")
    // epoch 0: the original; epoch 1: a near-copy (one token edited —
    // far above the 0.8 jaccard bar) plus an unrelated doc. The
    // per-batch gates CANNOT see this pair: exact fingerprints differ
    // and the docs arrived in different epochs
    CorpusIngest.applyBatch(spark,
      Seq(("fp1", 1L, base)).toDF("fp", "doc_id", "text"),
      bench, store, "corpus", 0L)
    CorpusIngest.applyBatch(spark,
      Seq(
        ("fp2", 2L, base.replace("tok7", "edited")),
        ("fp3", 3L, (1 to 30).map(j => s"other$j").mkString(" ")))
        .toDF("fp", "doc_id", "text"),
      bench, store, "corpus", 1L)
    assert(store.liveVersionCount("corpus") == 2,
      "incremental epochs should fan out versions")

    val dropped = CorpusIngest.compactNearDups(spark, store, "corpus")
    assert(dropped == 1L, s"expected the near-copy dropped, got $dropped")
    val got = CorpusIngest.corpus(spark, store, "corpus")
      .select("doc_id", "ingest_batch")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    // min-id representative survives; epoch lineage intact
    assert(got == Seq((1L, "0"), (3L, "1")), s"got $got")
    assert(store.liveVersionCount("corpus") == 1,
      "compaction should fold the read fan-out to one version")

    // ingest continues normally after compaction
    CorpusIngest.applyBatch(spark,
      Seq(("fp4", 4L, (1 to 30).map(j => s"fresh$j").mkString(" ")))
        .toDF("fp", "doc_id", "text"),
      bench, store, "corpus", 2L)
    val after = CorpusIngest.corpus(spark, store, "corpus")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(after == Seq(1L, 3L, 4L))
  }

  test("an offline-trained LM gate composes into the micro-batch path") {
    import graft.text.LangModel
    // train the perplexity model on a trusted seed corpus — the CCNet
    // deployment shape (the gate model is NOT trained on the feed)
    val seed = (1 to 40).map { i =>
      (i.toLong, (0 until 20).map(j => s"w${(i + j) % 5}").mkString(" "))
    }.toDF("doc_id", "text")
    val lm = LangModel.train(seed, col("text"))

    // in-distribution doc: every bigram is a counted (w_i, w_{i+1})
    // pair; gibberish doc: tokens the LM has never seen, every pair
    // falls to the smoothing floor
    val fluent = (0 until 15).map(j => s"w${(2 + j) % 5}").mkString(" ")
    val gibberish = (0 until 15).map(j => s"zzq$j").mkString(" ")
    val batch = Seq(
      ("fp1", 1L, fluent), ("fp2", 2L, gibberish))
      .toDF("fp", "doc_id", "text")

    // threshold between the two scores: fluent must clear it,
    // gibberish must not (scores are deterministic, so the midpoint
    // is a stable separator)
    val scores = LangModel.scoreDocs(batch, "doc_id", "text", lm)
      .select("doc_id", "lm_score")
      .as[(Long, Double)].collect().toMap
    assert(scores(1L) > scores(2L), s"LM failed to separate: $scores")
    val cut = (scores(1L) + scores(2L)) / 2

    val store = new TableStore(tmp("corpus_store3"))
    val bench = Seq((900L, "a b c d")).toDF("doc_id", "text")
    CorpusIngest.applyBatch(spark, batch, bench, store, "corpus", 0L,
      lmGate = Some((lm, cut)))
    val got = CorpusIngest.corpus(spark, store, "corpus")
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L), s"LM gate kept $got")

    // replay the epoch with the same gate: identical survivor set,
    // no duplicates — the gate is a deterministic function of batch
    // and static model state
    CorpusIngest.applyBatch(spark, batch, bench, store, "corpus", 0L,
      lmGate = Some((lm, cut)))
    val replayed = CorpusIngest.corpus(spark, store, "corpus")
      .select("doc_id").as[Long].collect().toSeq
    assert(replayed == Seq(1L), s"replay broke idempotence: $replayed")

    // no-evidence-means-drop: a doc too short to form a bigram scores
    // NULL and is dropped at ANY threshold, even a wildly permissive
    // one — the gate never passes documents it cannot score
    CorpusIngest.applyBatch(spark,
      Seq(("fp3", 3L, "solo"), ("fp4", 4L, fluent))
        .toDF("fp", "doc_id", "text"),
      bench, store, "corpus", 1L, lmGate = Some((lm, -1e9)))
    val afterShort = CorpusIngest.corpus(spark, store, "corpus")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(afterShort == Seq(1L, 4L),
      s"unscoreable doc must drop at any threshold, got $afterShort")
  }

  test("an offline-fit DSIR gate composes into the micro-batch path") {
    import graft.text.Dsir
    // fit the importance model offline: target = on-distribution
    // vocabulary, raw = target mixed with off-distribution text (the
    // DSIR deployment shape — the model is NOT fit on the feed)
    val onDist = (0 until 12).map(j => s"a${j % 4}").mkString(" ")
    val offDist = (0 until 12).map(j => s"z${j % 4}").mkString(" ")
    val target = (1 to 20).map(i => (i.toLong, onDist)).toDF("doc_id", "text")
    val raw = ((1 to 20).map(i => (i.toLong, onDist)) ++
      (21 to 40).map(i => (i.toLong, offDist))).toDF("doc_id", "text")
    val model = Dsir.fit(target, raw, col("text"), buckets = 256)

    val store = new TableStore(tmp("corpus_store_dsir"))
    val bench = Seq((900L, "x y z w")).toDF("doc_id", "text")
    val batch = Seq(("fp1", 1L, onDist), ("fp2", 2L, offDist))
      .toDF("fp", "doc_id", "text")
    // threshold 0 = "more target-like than the raw pool average"
    CorpusIngest.applyBatch(spark, batch, bench, store, "corpus", 0L,
      dsirGate = Some((model, 0.0)))
    val got = CorpusIngest.corpus(spark, store, "corpus")
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L), s"DSIR gate kept $got")

    // replay: deterministic function of batch + static model
    CorpusIngest.applyBatch(spark, batch, bench, store, "corpus", 0L,
      dsirGate = Some((model, 0.0)))
    val replayed = CorpusIngest.corpus(spark, store, "corpus")
      .select("doc_id").as[Long].collect().toSeq
    assert(replayed == Seq(1L), s"replay broke idempotence: $replayed")

    // unlike the LM gate there is no NULL path: an empty doc scores an
    // exact ZERO weight, so it passes a ≤0 threshold and drops above
    CorpusIngest.applyBatch(spark,
      Seq(("fp3", 3L, ""), ("fp4", 4L, onDist)).toDF("fp", "doc_id", "text"),
      bench, store, "corpus", 1L, dsirGate = Some((model, 0.0)))
    val afterEmpty = CorpusIngest.corpus(spark, store, "corpus")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(afterEmpty == Seq(1L, 3L, 4L),
      s"zero-weight doc must pass a 0.0 threshold, got $afterEmpty")
    CorpusIngest.applyBatch(spark,
      Seq(("fp5", 5L, ""), ("fp6", 6L, onDist)).toDF("fp", "doc_id", "text"),
      bench, store, "corpus", 2L, dsirGate = Some((model, 1e-9)))
    val afterStrict = CorpusIngest.corpus(spark, store, "corpus")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(afterStrict == Seq(1L, 3L, 4L, 6L),
      s"zero-weight doc must drop above 0, got $afterStrict")
  }

  test("a historical-corpus gate drops pre-stream documents exactly") {
    import graft.dedup.Dedup
    // the migration scenario: a corpus built by an earlier stream
    // incarnation exists; a NEW incarnation (fresh checkpoint —
    // firstSeen state knows nothing, epoch numbering RESTARTS AT 0)
    // must neither re-ingest those documents nor clobber their
    // partitions when its replayed epoch numbers collide
    val historicalText = "ten eleven twelve thirteen fourteen fifteen " +
      "sixteen seventeen eighteen nineteen"
    val novel = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val store = new TableStore(tmp("corpus_store4"))
    val bench = Seq((900L, "x y z w")).toDF("doc_id", "text")
    CorpusIngest.applyBatch(spark,
      Seq((TextOps_fp(historicalText), 50L, historicalText))
        .toDF("fp", "doc_id", "text"),
      bench, store, "corpus", 0L)

    // index + bloom derive from the STORED table's own fp column —
    // no text rescan; undersized bloom (forced false positives) makes
    // the exactness claim adversarial, as in DedupSpec
    val index = CorpusIngest.corpus(spark, store, "corpus").select("fp")
    val bloom = Dedup.exactBloomIndex(index, expectedItems = 4)

    // incarnation 2, EPOCH 0 AGAIN — the collision that, un-namespaced,
    // would overwrite incarnation 1's partition with the gated
    // (historical-doc-free) survivor set
    CorpusIngest.applyBatch(spark,
      Seq(
        (TextOps_fp(historicalText), 60L, historicalText), // known → drop
        (TextOps_fp(novel), 61L, novel))                   // new → keep
        .toDF("fp", "doc_id", "text"),
      bench, store, "corpus", 0L,
      historical = Some((index, bloom)), runId = "r2")

    val got = CorpusIngest.corpus(spark, store, "corpus")
      .select("doc_id", "ingest_batch").as[(Long, String)].collect().toMap
    assert(got.keySet == Set(50L, 61L),
      s"gate must drop 60, keep 61, and PRESERVE 50, got $got")
    assert(got(50L) == "0" && got(61L) == "r2.0",
      s"incarnations must write disjoint partitions, got $got")

    // a fully-gated replayed batch is the destructive edge: every doc
    // known → empty survivor set → without the namespace it would
    // ERASE the stored epoch-0 partition
    CorpusIngest.applyBatch(spark,
      Seq((TextOps_fp(historicalText), 70L, historicalText))
        .toDF("fp", "doc_id", "text"),
      bench, store, "corpus", 1L,
      historical = Some((index, bloom)), runId = "r2")
    val after = CorpusIngest.corpus(spark, store, "corpus")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(after == Seq(50L, 61L),
      s"fully-gated batch must not disturb stored data, got $after")

    // and the streaming entry refuses the un-namespaced foot-gun
    val ex = intercept[IllegalArgumentException] {
      CorpusIngest.start(spark,
        Seq((99L, novel)).toDF("doc_id", "text"), bench, store,
        "corpus", tmp("ckpt_gate"), historical = Some((index, bloom)))
    }
    assert(ex.getMessage.contains("runId"))
  }

  // the fingerprint rule the streaming prefix applies — tests plant
  // rows shaped like cleanStream output, so they must fingerprint the
  // same way (TextOps.fingerprint is a Column; evaluate it locally)
  private def TextOps_fp(text: String): String =
    Seq(text).toDF("text")
      .select(graft.text.TextOps.fingerprint(col("text")))
      .head().getString(0)
}

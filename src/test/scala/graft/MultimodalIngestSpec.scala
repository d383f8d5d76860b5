package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.multimodal.{AudioPrint, Phash, VideoPhash}
import graft.streaming.{ImageIngest, MultimodalIngest, TableStore}

/** The composed streaming multimodal manifest: one-pass per-batch
  * keep/drop rows across text/image/audio/video, batch parity with
  * q_multimodal_manifest, replay-idempotent TableStore sink, and the
  * real decode path end to end through a MemoryStream.
  */
class MultimodalIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // planted structure everywhere: (2k, 2k+1) are near-dups in every
  // binary modality (the synth rule) and exact dups in text (shared
  // text per pair)
  private def corpus(n: Long) =
    spark.range(0, n).toDF("doc_id").withColumn("text",
      concat(lit("body "), (col("doc_id") / 2).cast("long").cast("string")))

  private def imageHashes(docs: org.apache.spark.sql.DataFrame) =
    Phash.phash64(spark, Phash.synthGrayPngAssets(spark, docs)).toDF()
  private def audioHashes(docs: org.apache.spark.sql.DataFrame) =
    AudioPrint.audioprint64(spark,
        AudioPrint.synthWavPairAssets(spark, docs)).toDF()
      .select(col("asset_id"), col("fp_hi").as("ph_hi"),
        col("fp_lo").as("ph_lo"))
  private def videoHashes(docs: org.apache.spark.sql.DataFrame) =
    VideoPhash.signature(spark,
        VideoPhash.synthPngAviAssets(spark, docs)).toDF()
      .select(col("asset_id"), col("sig_hi").as("ph_hi"),
        col("sig_lo").as("ph_lo"))

  test("single batch against empty state equals the BATCH manifest") {
    val docs = corpus(12)
    // the q_multimodal_manifest composition, verbatim (batch form)
    val textKeeps = Dedup.exactDedup(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"), lit(true).as("tk"))
    def drops(pairs: org.apache.spark.sql.DataFrame, flag: String) =
      Dedup.nearDupClusters(
          pairs.select(col("id_1").as("doc_a"), col("id_2").as("doc_b")))
        .filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id"), lit(false).as(flag))
    val img = drops(Phash.neardupPairs(imageHashes(docs)), "ik")
    val aud = drops(Phash.neardupPairs(audioHashes(docs)), "ak")
    val vid = drops(Phash.neardupPairs(videoHashes(docs)), "vk")
    val expected = docs.select(col("doc_id"))
      .join(textKeeps, Seq("doc_id"), "left")
      .join(img, Seq("doc_id"), "left")
      .join(aud, Seq("doc_id"), "left")
      .join(vid, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("tk"), lit(false)).as("text_keep"),
        coalesce(col("ik"), lit(true)).as("image_keep"),
        coalesce(col("ak"), lit(true)).as("audio_keep"),
        coalesce(col("vk"), lit(true)).as("video_keep"))
      .collect().map(_.toSeq).toSet
    val got = MultimodalIngest.manifestBatch(spark, docs,
        imageHashes(docs), audioHashes(docs), videoHashes(docs),
        MultimodalIngest.emptyTextSeen(spark),
        ImageIngest.emptyIndex(spark), ImageIngest.emptyIndex(spark),
        ImageIngest.emptyIndex(spark))
      .select("doc_id", "text_keep", "image_keep", "audio_keep",
        "video_keep")
      .collect().map(_.toSeq).toSet
    assert(got == expected, "single-batch manifest must equal the batch form")
    // and the planted ground truth holds: evens keep everything
    assert(got.filter(_(1) == true).map(_.head) ==
      (0L until 12L by 2).toSet.map((x: Long) => x: Any))
  }

  test("two-epoch applyBatch: cross-epoch drops, replay idempotence") {
    val docs = corpus(8)
    val store = new TableStore(tmp("mm_store"))
    val tables = ("manifest", "tfp", "ibands", "abands", "vbands")
    def run(epoch: Long, d: org.apache.spark.sql.DataFrame): Unit =
      MultimodalIngest.applyBatch(spark, d.select("doc_id", "text"),
        imageHashes(d), audioHashes(d), videoHashes(d), store,
        tables._1, tables._2, tables._3, tables._4, tables._5,
        epoch, runId = "r1")
    // epoch 0: evens (each pair's planted representative); epoch 1:
    // odds — every odd is near its even twin in all modalities and
    // shares its text → all four gates drop it
    run(0L, docs.filter(col("doc_id") % 2 === 0))
    run(1L, docs.filter(col("doc_id") % 2 =!= 0))
    val m = MultimodalIngest.manifest(spark, store, "manifest")
    val byDoc = m.select("doc_id", "n_kept", "keep_all")
      .as[(Long, Int, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(byDoc.size == 8)
    (0L until 8L by 2).foreach { id =>
      assert(byDoc(id)._2 == 4 && byDoc(id)._3, s"even $id must keep all") }
    (1L until 8L by 2).foreach { id =>
      assert(byDoc(id)._2 == 0 && !byDoc(id)._3, s"odd $id must drop all") }
    // replay epoch 1: identical manifest, no duplicated state rows
    val stateBefore = store.read(spark, "ibands",
      ImageIngest.indexSchema).count()
    val manifestBefore = m.collect().map(_.toSeq).toSet
    run(1L, docs.filter(col("doc_id") % 2 =!= 0))
    assert(MultimodalIngest.manifest(spark, store, "manifest")
      .collect().map(_.toSeq).toSet == manifestBefore,
      "replayed epoch must rewrite its manifest partition unchanged")
    assert(store.read(spark, "ibands", ImageIngest.indexSchema)
      .count() == stateBefore,
      "replayed epoch must rewrite its band partition, not append")
  }

  test("recomputeManifest: late-linking chain + id-order inversion " +
      "repair to the batch manifest, one CAS version") {
    // hand-crafted hash frames (no decode): image chain A=doc1 (0,0),
    // B=doc2 (0,1), C=doc3 (0,15) — hamming(A,B)=1, hamming(B,C)=3,
    // hamming(A,C)=4 > 3, so B is the LINKING member; text group
    // {4,5} shares a fingerprint with the MIN id arriving second.
    // Epoch 0 = {1,3,5}, epoch 1 = {2,4}: the online gate keeps BOTH
    // 1 and 3 (B arrives last) and elects 5 (4 arrives later) — both
    // decisions offline clustering reverses.
    def spread(id: Long): (Long, Long) = {
      val x = id * 0x9E3779B97F4A7C15L
      (x, java.lang.Long.rotateLeft(x, 17))
    }
    val imageOf = Map(1L -> (0L, 0L), 2L -> (0L, 1L), 3L -> (0L, 15L),
      4L -> spread(104L), 5L -> spread(105L))
    def hashFrame(ids: Seq[Long], of: Long => (Long, Long)) =
      ids.map(i => (i, of(i)._1, of(i)._2))
        .toDF("asset_id", "ph_hi", "ph_lo")
    def run(store: TableStore, epoch: Long,
        docs: org.apache.spark.sql.DataFrame, ids: Seq[Long]): Unit =
      MultimodalIngest.applyBatch(spark, docs,
        hashFrame(ids, imageOf),
        hashFrame(ids, i => spread(200L + i)),
        hashFrame(ids, i => spread(300L + i)),
        store, "manifest", "tfp", "ibands", "abands", "vbands",
        epoch, runId = "rp")
    val store = new TableStore(tmp("mm_repair"))
    val e0 = Seq((1L, "one"), (3L, "three"), (5L, "t"))
      .toDF("doc_id", "text")
    val e1 = Seq((2L, "two"), (4L, "t")).toDF("doc_id", "text")
    run(store, 0L, e0, Seq(1L, 3L, 5L))
    run(store, 1L, e1, Seq(2L, 4L))
    def flags(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "text_keep", "image_keep", "audio_keep",
          "video_keep")
        .as[(Long, Boolean, Boolean, Boolean, Boolean)]
        .collect().map(r => r._1 -> r).toMap
    val online = flags(MultimodalIngest.manifest(spark, store, "manifest"))
    assert(online(3L)._3, "online gate must keep doc 3 (link not yet seen)")
    assert(!online(2L)._3, "doc 2 arrives near both indexed ends")
    assert(online(5L)._2 && !online(4L)._2,
      "online text gate elects the FIRST-seen id 5 over the later min 4")
    val changed = MultimodalIngest.recomputeManifest(spark, store,
      "manifest", "tfp", "ibands", "abands", "vbands")
    // exactly the three reversed decisions: doc3 image, doc4/5 text
    assert(changed == 3L, s"expected 3 corrected rows, got $changed")
    val after = MultimodalIngest.manifest(spark, store, "manifest")
    val repaired = flags(after)
    assert(!repaired(3L)._3 && repaired(1L)._3,
      "offline clustering collapses {1,2,3} to its min member")
    assert(repaired(4L)._2 && !repaired(5L)._2,
      "offline text keep is the global min id of the fingerprint group")
    // the repair contract: equality with the BATCH manifest over the
    // full corpus (manifestBatch against empty state), row for row
    val full = e0.unionByName(e1)
    val allIds = Seq(1L, 2L, 3L, 4L, 5L)
    val batch = MultimodalIngest.manifestBatch(spark, full,
      hashFrame(allIds, imageOf),
      hashFrame(allIds, i => spread(200L + i)),
      hashFrame(allIds, i => spread(300L + i)),
      MultimodalIngest.emptyTextSeen(spark),
      ImageIngest.emptyIndex(spark), ImageIngest.emptyIndex(spark),
      ImageIngest.emptyIndex(spark))
    assert(after.select("doc_id", "text_keep", "image_keep",
        "audio_keep", "video_keep", "n_kept", "keep_all")
        .collect().map(_.toSeq).toSet ==
      batch.collect().map(_.toSeq).toSet,
      "repaired manifest must equal the batch manifest on the corpus")
    // partition identity preserved: doc 3's row stays in its epoch-0
    // partition (the rewrite is ONE new version, partition-aligned)
    val part = after.filter(col("doc_id") === 3L)
      .select("epoch", "ingest_batch").as[(Long, String)].head()
    assert(part == ((0L, "rp.0")))
  }

  test("streaming end to end: real decode of all three modalities") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // payload maps from the synth pipelines (planted pair (0, 1))
    val ids = spark.range(0, 2).toDF("doc_id")
      .unionByName(Seq(50L).toDF("doc_id"))
    val png = Phash.synthGrayPngAssets(spark, ids)
      .collect().map(a => a.asset_id -> a.payload).toMap
    val wav = AudioPrint.synthWavPairAssets(spark, ids)
      .collect().map(a => a.asset_id -> a.payload).toMap
    val avi = VideoPhash.synthPngAviAssets(spark, ids)
      .collect().map(a => a.asset_id -> a.payload).toMap
    def row(id: Long, text: String, payloadId: Long) =
      (id, text, png(payloadId), wav(payloadId), avi(payloadId))
    val store = new TableStore(tmp("mm_stream_store"))
    val ms = MemoryStream[(Long, String, Array[Byte], Array[Byte], Array[Byte])]
    val q = MultimodalIngest.start(spark,
      ms.toDF().toDF("doc_id", "text", "image", "audio", "video"),
      store, "manifest", "tfp", "ibands", "abands", "vbands",
      tmp("mm_ckpt"), runId = "s1")
    try {
      // batch 1: the planted pair — 0 keeps everything, 1 drops
      ms.addData(row(0L, "alpha", 0L), row(1L, "alpha", 1L))
      q.processAllAvailable()
      // batch 2: doc 0's exact payloads + text under a NEW id (all
      // four gates drop via stored state) + a genuinely new doc
      ms.addData(row(100L, "alpha", 0L), row(50L, "omega", 50L))
      q.processAllAvailable()
      val got = MultimodalIngest.manifest(spark, store, "manifest")
        .select("doc_id", "epoch", "n_kept", "keep_all")
        .as[(Long, Long, Int, Boolean)].collect()
        .map(r => r._1 -> r).toMap
      assert(got.keySet == Set(0L, 1L, 50L, 100L))
      assert(got(0L)._3 == 4 && got(0L)._4)
      assert(got(1L)._3 == 0 && !got(1L)._4)
      assert(got(100L)._3 == 0 && !got(100L)._4,
        "a re-sent document must drop in every modality via stored state")
      assert(got(50L)._3 == 4 && got(50L)._4)
      assert(got(100L)._2 == 1L && got(0L)._2 == 0L)
    } finally q.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{Multimodal, Phash}
import graft.streaming.{ImageIngest, TableStore}

/** The image-modality streaming ingest gate: pHash band-index
  * first-seen state, per-batch connected-component gating, replay
  * idempotence — the [[graft.streaming.CorpusIngest]] discipline on
  * the image near-dup family.
  */
class ImageIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // hand-crafted hash chain: B within radius of A, C within radius of
  // B but NOT of A (the transitive shape), D far from everything
  private val A = (10L, 0x0123456789ABCDEFL, 0x00000000FEDCBA98L)
  private val B = (11L, A._2, A._3 ^ 0x3L) // hamming(A,B) = 2
  private val C = (12L, B._2, B._3 ^ 0xCL) // hamming(B,C)=2, (A,C)=4
  private val D = (13L, ~A._2, A._3) // hamming(A,D) = 64... far
  private def hashDf(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("asset_id", "ph_hi", "ph_lo")

  test("single batch against an empty index keeps component representatives") {
    val kept = ImageIngest.gateBatch(spark, hashDf(A, B, C, D),
        ImageIngest.emptyIndex(spark))
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    // {A,B,C} chain into one component (A–B and B–C edges; A–C is
    // outside the radius but connected) → representative 10; D isolated
    assert(kept == Set(10L, 13L))
  }

  test("a component touching the index is dropped entirely") {
    // index holds A's bands: B is within radius of A, C only of B —
    // the B–C component is contaminated through B, so BOTH drop
    val index = Phash.bandRows(hashDf(A))
      .select(col("b"), col("v"), col("ph_hi"), col("ph_lo"))
    val kept = ImageIngest.gateBatch(spark, hashDf(B, C, D), index)
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(kept == Set(13L))
    // and the Bloom fast path is behavior-identical (no false
    // negatives; positives pay the same verify join)
    val keptBloom = ImageIngest.gateBatch(spark, hashDf(B, C, D), index,
        indexBloom = Some(ImageIngest.bandBloom(index)))
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(keptBloom == Set(13L))
  }

  test("cross-batch transitive chains collapse to the first-seen member") {
    val store = new TableStore(tmp("img_store"))
    // epochs: {A} → kept; {B} → near A, dropped BUT recorded; {C} →
    // near only B (dropped earlier) → still dropped; {D} → kept
    Seq((0L, hashDf(A)), (1L, hashDf(B)), (2L, hashDf(C)),
      (3L, hashDf(D))).foreach { case (ep, h) =>
      ImageIngest.applyBatch(spark, h, store, "images", "bands", ep)
    }
    val kept = ImageIngest.images(spark, store, "images")
      .as[(Long, Long, Long, String)].collect().map(_._1).toSet
    assert(kept == Set(10L, 13L),
      "C must drop through the recorded-though-dropped B sighting")

    // replay idempotence: re-running epoch 1 rewrites its partitions —
    // identical kept set, no duplicate band rows
    val bandsBefore = store.read(spark, "bands", ImageIngest.indexSchema)
      .count()
    ImageIngest.applyBatch(spark, hashDf(B), store, "images", "bands", 1L)
    assert(ImageIngest.images(spark, store, "images")
      .as[(Long, Long, Long, String)].collect().map(_._1).toSet ==
      Set(10L, 13L))
    assert(store.read(spark, "bands", ImageIngest.indexSchema)
      .count() == bandsBefore,
      "replayed epoch must rewrite its band partition, not append")
  }

  test("compaction collapses chains whose linking member arrived last") {
    val store = new TableStore(tmp("img_compact_store"))
    // arrival A, C, B: C is outside A's radius so the online gate
    // keeps both; B (near BOTH) arrives last and is dropped — but its
    // recorded sighting is the link that offline clustering sees
    Seq((0L, hashDf(A)), (1L, hashDf(C)), (2L, hashDf(B)))
      .foreach { case (ep, h) =>
        ImageIngest.applyBatch(spark, h, store, "images", "bands", ep)
      }
    assert(ImageIngest.images(spark, store, "images")
      .as[(Long, Long, Long, String)].collect().map(_._1).toSet ==
      Set(10L, 12L), "online gate keeps A and C (no direct edge)")
    val dropped = ImageIngest.compactNearDups(
      spark, store, "images", "bands")
    assert(dropped == 1L)
    assert(ImageIngest.images(spark, store, "images")
      .as[(Long, Long, Long, String)].collect().map(_._1).toSet ==
      Set(10L),
      "compaction must collapse {A,C} through the dropped B sighting")
  }

  test("batch parity: one-shot gate keeps exactly the planted representatives") {
    // the synthesis ground truth (not the operator itself): documents
    // pair as (2k, 2k+1) with the odd a planted radius-3 near-dup of
    // the even, so one-shot gating the whole corpus against an empty
    // index must keep exactly the even ids — the same representative
    // set q_image_dedup_clusters certifies
    val docs = spark.range(0, 20).toDF("doc_id")
    val hashes = Phash.phash64(spark,
      Phash.synthGrayPngAssets(spark, docs)).toDF()
    val kept = ImageIngest.gateBatch(spark, hashes,
        ImageIngest.emptyIndex(spark))
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(kept == (0L until 20L by 2).toSet)
  }

  test("streaming end to end: real PNG decode, cross-batch near-dup gate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // a PNG whose pixels follow doc `srcId`'s synthesis lattice with
    // one +8 bump — a re-encoded light edit of the stored image, the
    // exact profile the gate exists to drop
    def editedPng(srcId: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(Phash.Side, Phash.Side,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until Phash.Side).foreach { y =>
        (0 until Phash.Side).foreach { x =>
          val base = Phash.synthPixel(srcId, x, y)
          val v = if (x == 7 && y == 3) math.min(255, base + 8) else base
          img.getRaster.setSample(x, y, 0, v)
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val synth = Phash.synthGrayPngAssets(spark,
        spark.range(0, 2).toDF("doc_id")
          .unionByName(Seq(50L).toDF("doc_id")))
      .collect().map(a => a.asset_id -> a).toMap

    val store = new TableStore(tmp("img_stream_store"))
    val ms = MemoryStream[Multimodal.Asset]
    val q = ImageIngest.start(spark, ms.toDF(), store, "images", "bands",
      tmp("img_ckpt"), runId = "inc1")
    try {
      // batch 1: the planted pair (0 kept, 1 dropped intra-batch)
      ms.addData(synth(0L), synth(1L))
      q.processAllAvailable()
      // batch 2: a light edit of image 0 under a NEW id (dropped via
      // the band index) + a genuinely new image (kept)
      ms.addData(Multimodal.Asset(100L, "image/png", editedPng(0L)),
        synth(50L))
      q.processAllAvailable()
      val got = ImageIngest.images(spark, store, "images")
        .as[(Long, Long, Long, String)].collect()
      assert(got.map(_._1).toSet == Set(0L, 50L), s"got ${got.toSeq}")
      assert(got.map(_._4).distinct.length == 2,
        "epochs land in distinct runId-namespaced partitions")
    } finally q.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("feature extraction: byte length and md5 match expression path") {
    val docs = Seq((1L, "hello"), (2L, "wörld")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(
      spark, Multimodal.assetsFromDocuments(docs)).toDF()
    val got = feats.select("asset_id", "n_bytes", "content_hash")
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // expression-path oracle on the same session
    val exp = docs.select(col("doc_id"),
      length(col("text").cast("binary")).cast("long").as("n"),
      md5(col("text").cast("binary")).as("h"))
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == exp)
    // unicode: "wörld" is 6 utf-8 bytes, 5 chars
    assert(got(2L)._1 == 6L)
  }

  test("stub decode is deterministic") {
    val p = "payload".getBytes("UTF-8")
    assert(Multimodal.StubCodec.decodeImage(p) ==
      Multimodal.StubCodec.decodeImage(p.clone()))
  }

  test("WavCodec round-trips real RIFF/WAVE containers bit-exactly") {
    // hand-built 4-sample mono 16-bit clip through the SAME pipeline:
    // synth writes a true WAV container, decode parses header + PCM
    val samples = Array[Short](100, -32768, 0, 32767)
    val pcm = new Array[Byte](8)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 4L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    // a real container: RIFF magic, not bare PCM
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val m = Multimodal.WavCodec.decodeAudio(wav)
    assert(m == Multimodal.AudioMeta(8000, 1, 16, 4L,
      peak = 32768L, sumAbs = 100L + 32768L + 0L + 32767L))
    // non-audio bytes fail loudly (no fabricated stats)
    intercept[Exception] {
      Multimodal.WavCodec.decodeAudio("not a wav".getBytes("UTF-8"))
    }
  }

  test("synthWavAssets → extractAudioFeatures replays the waveform") {
    val docs = Seq((0L, "x"), (7L, "y"), (499L, "z")).toDF("doc_id", "text")
    val feats = Multimodal.extractAudioFeatures(
      spark, Multimodal.synthWavAssets(spark, docs)).collect()
      .map(f => f.asset_id -> f).toMap
    // independent Scala replay of the documented integer recurrence
    for (id <- Seq(0L, 7L, 499L)) {
      val n = (8000L + id % 8000L).toInt
      val vs = (0 until n).map(i =>
        ((id * 40503L + i.toLong * 2654435761L) % 65536L) - 32768L)
      val f = feats(id)
      assert(f.n_frames == n.toLong && f.sample_rate == 8000 &&
        f.channels == 1 && f.bits == 16)
      assert(f.duration_ms == n.toLong * 1000L / 8000L)
      assert(f.peak == vs.map(math.abs).max)
      assert(f.sum_abs == vs.map(math.abs).sum)
    }
  }

  test("sampleAudioWindows: cadence from the REAL decoded duration") {
    // doc_id 0 -> 8000 samples @8kHz = 1000 ms -> 4 windows of 250;
    // doc_id 4000 -> 12000 samples = 1500 ms -> 6 windows
    val docs = Seq((0L, "x"), (4000L, "y")).toDF("doc_id", "text")
    val got = Multimodal.sampleAudioWindows(spark,
        Multimodal.synthWavAssets(spark, docs))
      .collect().map(w => (w.asset_id, w.window_idx, w.start_ms, w.end_ms))
      .toSet
    assert(got == Set(
      (0L, 0, 0L, 250L), (0L, 1, 250L, 500L),
      (0L, 2, 500L, 750L), (0L, 3, 750L, 1000L),
      (4000L, 0, 0L, 250L), (4000L, 1, 250L, 500L),
      (4000L, 2, 500L, 750L), (4000L, 3, 750L, 1000L),
      (4000L, 4, 1000L, 1250L), (4000L, 5, 1250L, 1500L)))
  }

  private def fixturePng(): Array[Byte] = {
    val in = getClass.getResourceAsStream("/multimodal/fixture_4x3.png")
    assert(in != null, "missing committed PNG fixture")
    try in.readAllBytes() finally in.close()
  }

  test("ImageIoCodec decodes the committed PNG fixture's real dimensions") {
    assert(Multimodal.ImageIoCodec.decodeImage(fixturePng()) == (4, 3))
    // undecodable bytes fail loudly instead of fabricating dimensions
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decodeImage("not a png".getBytes("UTF-8"))
    }
  }

  test("extractFeatures with ImageIoCodec reports real dims through the pipeline") {
    val png = fixturePng()
    val assets = Seq((1L, "image/png", png)).toDF("asset_id", "mime", "payload")
    val feats = Multimodal.extractFeatures(spark, assets, Multimodal.ImageIoCodec)
      .collect()
    assert(feats.length == 1)
    assert((feats(0).width, feats(0).height) == (4, 3))
    assert(feats(0).n_bytes == png.length.toLong)
  }

  test("resizeAssets with ImageIoCodec re-encodes at the target size") {
    val assets = Seq((1L, "image/png", fixturePng()))
      .toDF("asset_id", "mime", "payload")
    val resized = Multimodal.resizeAssets(
      spark, assets, 8, 6, Multimodal.ImageIoCodec).collect()
    assert(resized.length == 1)
    // the output is itself a decodable image at the requested size
    assert(Multimodal.ImageIoCodec.decodeImage(resized(0).payload) == (8, 6))
  }

  test("sampleFrames: one row per interval, deterministic bytes, 1→N shape") {
    val docs = Seq((1L, "x" * 300), (2L, "y")).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
      spark, Multimodal.assetsFromDocuments(docs), everyMs = 1000L)
    val got = frames.collect().groupBy(_.asset_id)
    // duration stub = 10 ms per byte → 300 bytes = 3000 ms = 3 frames
    assert(got(1L).length == 3)
    assert(got(1L).map(_.ts_ms).sorted.toSeq == Seq(0L, 1000L, 2000L))
    assert(got(2L).length == 1, "short asset still yields one frame")
    // rerun is byte-identical (stub is a pure function)
    val again = Multimodal.sampleFrames(
      spark, Multimodal.assetsFromDocuments(docs), everyMs = 1000L)
      .collect().groupBy(_.asset_id)
    assert(got(1L).sortBy(_.frame_idx).map(_.frame_bytes.toSeq).toSeq ==
      again(1L).sortBy(_.frame_idx).map(_.frame_bytes.toSeq).toSeq)
  }

  test("resizeAssets preserves schema and ids; payload is deterministic") {
    val docs = Seq((1L, "abc"), (2L, "def")).toDF("doc_id", "text")
    val resized = Multimodal.resizeAssets(
      spark, Multimodal.assetsFromDocuments(docs), 256, 256)
    assert(resized.toDF().columns.toSeq == Seq("asset_id", "mime", "payload"))
    val a = resized.collect().sortBy(_.asset_id)
    val b = Multimodal.resizeAssets(
      spark, Multimodal.assetsFromDocuments(docs), 256, 256)
      .collect().sortBy(_.asset_id)
    assert(a.map(_.payload.toSeq).toSeq == b.map(_.payload.toSeq).toSeq)
    assert(a.map(_.asset_id).toSeq == Seq(1L, 2L))
  }
}

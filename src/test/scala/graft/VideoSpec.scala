package graft

import graft.multimodal.{Multimodal, Video}

class VideoSpec extends SparkTestBase {
  import spark.implicits._

  private def jpeg(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      img.setRGB(x, y, (seed * 31 + x * 7 + y) & 0xFFFFFF)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("AVI-MJPEG write → parse round-trips container metadata and frames") {
    val frames = Seq(jpeg(16, 12, 1), jpeg(24, 20, 2), jpeg(40, 28, 3))
    val avi = Video.AviMjpegCodec.write(frames, 125000L, 40, 28)
    val m = Video.AviMjpegCodec.parse(avi)
    assert(m.usPerFrame == 125000L)
    assert(m.totalFrames == 3)
    assert((m.width, m.height) == (40, 28))
    assert(m.frames.size == 3)
    // byte-exact frame payload recovery through the chunk walk
    m.frames.zip(frames).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want))
    }
    // and every recovered frame still JPEG-decodes to its true dims
    assert(m.frames.map(Multimodal.ImageIoCodec.decodeImage) ==
      Seq((16, 12), (24, 20), (40, 28)))
  }

  test("odd-sized frame chunks are padded per RIFF and still recovered") {
    // force an odd body: JPEGs vary, so append a byte when even
    val f0 = jpeg(16, 12, 7)
    val odd = if (f0.length % 2 == 1) f0 else f0 :+ 0xD9.toByte
    val even = jpeg(24, 12, 8)
    val m = Video.AviMjpegCodec.parse(
      Video.AviMjpegCodec.write(Seq(odd, even, odd), 40000L, 24, 12))
    assert(m.totalFrames == 3)
    assert(java.util.Arrays.equals(m.frames(0), odd))
    assert(java.util.Arrays.equals(m.frames(1), even))
  }

  test("parser fails loudly on non-AVI bytes and non-MJPG streams") {
    intercept[IllegalArgumentException] {
      Video.AviMjpegCodec.parse("not a riff container at all".getBytes)
    }
    val avi = Video.AviMjpegCodec.write(Seq(jpeg(16, 12, 1)), 125000L, 16, 12)
    // corrupt the strh handler fourcc in place: MJPG -> XVID
    val idx = avi.indexOfSlice("vidsMJPG".getBytes)
    assert(idx > 0)
    val bad = avi.clone()
    "XVID".getBytes.zipWithIndex.foreach { case (b, i) => bad(idx + 4 + i) = b }
    intercept[IllegalArgumentException] { Video.AviMjpegCodec.parse(bad) }
  }

  test("synth clips decode to the documented count/cadence/dims rule") {
    val docs = Seq(0L, 5L, 11L).toDF("doc_id")
    val feats = Video.extractVideoFeatures(
      spark, Video.synthAviAssets(spark, docs))
      .collect().map(f => f.asset_id -> f).toMap
    Seq(0L, 5L, 11L).foreach { id =>
      val f = feats(id)
      val nf = Video.synthFrameCount(id)
      assert(f.n_frames == nf)
      assert(f.us_per_frame == 125000L)
      assert(f.duration_ms == nf.toLong * 125L)
      assert((f.width, f.height) == (40, 28))
      val dims = (0 until nf).map(Video.synthFrameDims(id, _))
      assert(f.sum_frame_w == dims.map(_._1.toLong).sum)
      assert(f.sum_frame_h == dims.map(_._2.toLong).sum)
    }
  }

  test("videoFrames: per-frame rows carry real per-frame JPEG dims") {
    val docs = Seq(7L).toDF("doc_id")
    val rows = Video.videoFrames(spark, Video.synthAviAssets(spark, docs))
      .collect().sortBy(_.frame_idx)
    assert(rows.length == Video.synthFrameCount(7L))
    rows.foreach { r =>
      assert(r.ts_ms == r.frame_idx.toLong * 125L)
      assert((r.frame_w, r.frame_h) == Video.synthFrameDims(7L, r.frame_idx))
    }
    // the dims genuinely vary across frames (the per-frame-decode
    // certification depends on it)
    assert(rows.map(r => (r.frame_w, r.frame_h)).distinct.size > 1)
  }
}

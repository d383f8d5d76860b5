package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import Multimodal.Asset

/** REAL video container decode on pure JVM: AVI is RIFF — the exact
  * container format [[Multimodal.WavCodec]] already certified — and
  * MJPEG frames are plain JPEG, which `javax.imageio` decodes. So an
  * AVI-MJPEG codec closes the video modality with ZERO new
  * dependencies: [[AviMjpegCodec.write]] emits a genuine
  * RIFF/AVI container (hdrl with avih + strl/strh/strf, a movi chunk
  * list of `00dc` JPEG frames, and an idx1 index), and
  * [[AviMjpegCodec.parse]] walks the chunk tree back — header →
  * cadence metadata, movi → per-frame JPEG payloads, each decoded for
  * its REAL dimensions via the imageio header read (no pixel
  * materialization — the 100 TB metadata-pass shape).
  *
  * The reference's pipeline has no video operators (its columns stop
  * at POS scalar fields — reference
  * `secondDataPipeline/kafka_consumer/kafka_consumer.py`'s schemas
  * are string/int/double only); this module is part of the
  * training-data-pipeline brief:
  * frame-cadence sampling and per-frame feature extraction are the
  * 1→N preprocessing shape every multimodal corpus build needs.
  *
  * Determinism contract (the WavCodec precedent,
  * Multimodal.scala): [[synthAviAssets]] builds containers whose
  * frame COUNT, CADENCE, and per-frame DIMENSIONS are pure integer
  * functions of the document id, so a DuckDB oracle replays the
  * decoded metadata exactly — a Spark-side container bug (chunk
  * offset off-by-one, wrong size word, bad JPEG slice) breaks the
  * hash. Frame pixel CONTENT goes through real lossy JPEG and is
  * deliberately not hashed.
  *
  * Scale: synthesis and decode are both per-clip linear, partition-
  * parallel `mapPartitions` with zero shuffle; a real corpus swaps
  * [[synthAviAssets]] for a binary-file scan with no plan change.
  */
object Video {

  /** Parsed AVI metadata + the raw JPEG payload of every frame. */
  final case class AviMeta(
      usPerFrame: Long,
      totalFrames: Int,
      width: Int,
      height: Int,
      frames: Seq[Array[Byte]])

  object AviMjpegCodec extends Serializable {

    /** The two frame codecs this container implementation carries:
      * `MJPG` (lossy JPEG frames — the metadata pipeline) and the
      * registered motion-PNG fourcc `MPNG` (lossless PNG frames —
      * the content-hash pipeline, [[VideoPhash]], where the oracle
      * must replay decoded pixels exactly). Anything else fails
      * loudly (the WavCodec 16-bit-PCM-only discipline).
      */
    val SupportedCodecs: Set[String] = Set("MJPG", "MPNG")

    private def fourcc(p: Array[Byte], off: Int): String =
      new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private def u32(p: Array[Byte], off: Int): Long =
      (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
        ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)

    /** Walk the RIFF chunk tree: every chunk is
      * `fourcc(4) size(u32le) body(size) [pad to even]`; `LIST`
      * bodies open with a 4-byte list type then nest more chunks.
      * Collects avih cadence fields, validates the stream headers
      * (`vids`/`MJPG` — fails loudly on any other codec, the
      * WavCodec 16-bit-PCM-only discipline), and slices each `00dc`
      * frame chunk out as JPEG bytes.
      */
    def parse(p: Array[Byte]): AviMeta = {
      require(p.length >= 12 && fourcc(p, 0) == "RIFF" &&
        fourcc(p, 8) == "AVI ",
        "AviMjpegCodec: not a RIFF/AVI container")
      val riffEnd = math.min(p.length.toLong, 8L + u32(p, 4)).toInt
      var usPerFrame = -1L
      var totalFrames = -1
      var w = -1
      var h = -1
      var sawMjpegStream = false
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(start: Int, end: Int): Unit = {
        var pos = start
        while (pos + 8 <= end) {
          val id = fourcc(p, pos)
          val sz = u32(p, pos + 4).toInt
          val body = pos + 8
          require(body + sz <= end,
            s"AviMjpegCodec: chunk '$id' overruns its parent " +
              s"(body $body + $sz > $end)")
          id match {
            case "LIST" => walk(body + 4, body + sz)
            case "avih" =>
              require(sz >= 40, s"AviMjpegCodec: short avih ($sz)")
              usPerFrame = u32(p, body)
              totalFrames = u32(p, body + 16).toInt
              w = u32(p, body + 32).toInt
              h = u32(p, body + 36).toInt
            case "strh" =>
              require(fourcc(p, body) == "vids" &&
                SupportedCodecs.contains(fourcc(p, body + 4)),
                "AviMjpegCodec: only vids MJPG/MPNG streams " +
                  s"supported, got ${fourcc(p, body)}/" +
                  fourcc(p, body + 4))
            case "strf" =>
              require(sz >= 20 &&
                SupportedCodecs.contains(fourcc(p, body + 16)),
                "AviMjpegCodec: strf biCompression must be MJPG or MPNG")
              sawMjpegStream = true
            case "00dc" =>
              frames += java.util.Arrays.copyOfRange(p, body, body + sz)
            case _ => () // idx1, JUNK, unknown chunks: skip by size
          }
          pos = body + sz + (sz & 1)
        }
      }
      walk(12, riffEnd)
      require(sawMjpegStream, "AviMjpegCodec: no MJPG stream format chunk")
      require(totalFrames == frames.length,
        s"AviMjpegCodec: header claims $totalFrames frames, movi " +
          s"holds ${frames.length}")
      AviMeta(usPerFrame, totalFrames, w, h, frames.toSeq)
    }

    /** Emit a genuine AVI-MJPEG container: RIFF('AVI ') → LIST(hdrl){
      * avih, LIST(strl){strh, strf}} → LIST(movi){00dc…} → idx1. All
      * size words little-endian, odd-sized chunks padded to even per
      * the RIFF rule (the pad byte is exactly what an
      * off-by-one-intolerant parser trips over — [[parse]] must walk
      * it correctly or the oracle hash breaks).
      */
    def write(
        frames: Seq[Array[Byte]],
        usPerFrame: Long,
        width: Int,
        height: Int,
        codec: String = "MJPG"): Array[Byte] = {
      require(frames.nonEmpty, "AviMjpegCodec: at least one frame")
      require(SupportedCodecs.contains(codec),
        s"AviMjpegCodec: unsupported codec fourcc '$codec'")
      val bb = new ByteArrayOutputStream()
      def le32(v: Long): Array[Byte] = ByteBuffer.allocate(4)
        .order(ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()
      def cc(s: String): Array[Byte] =
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val out = new ByteArrayOutputStream()
        out.write(cc(id)); out.write(le32(body.length)); out.write(body)
        if ((body.length & 1) == 1) out.write(0) // RIFF even padding
        out.toByteArray
      }
      def list(listType: String, body: Array[Byte]): Array[Byte] =
        chunk("LIST", cc(listType) ++ body)
      val maxFrame = frames.map(_.length).max
      val avih = new ByteArrayOutputStream()
      avih.write(le32(usPerFrame)) // dwMicroSecPerFrame
      avih.write(le32(0)) // dwMaxBytesPerSec
      avih.write(le32(0)) // dwPaddingGranularity
      avih.write(le32(0x10)) // dwFlags: AVIF_HASINDEX
      avih.write(le32(frames.length.toLong)) // dwTotalFrames
      avih.write(le32(0)) // dwInitialFrames
      avih.write(le32(1)) // dwStreams
      avih.write(le32(maxFrame.toLong)) // dwSuggestedBufferSize
      avih.write(le32(width.toLong))
      avih.write(le32(height.toLong))
      (0 until 4).foreach(_ => avih.write(le32(0))) // dwReserved
      val strh = new ByteArrayOutputStream()
      strh.write(cc("vids")) // fccType
      strh.write(cc(codec)) // fccHandler
      strh.write(le32(0)) // dwFlags
      strh.write(le32(0)) // wPriority + wLanguage
      strh.write(le32(0)) // dwInitialFrames
      strh.write(le32(usPerFrame)) // dwScale
      strh.write(le32(1000000L)) // dwRate (fps = rate/scale)
      strh.write(le32(0)) // dwStart
      strh.write(le32(frames.length.toLong)) // dwLength
      strh.write(le32(maxFrame.toLong)) // dwSuggestedBufferSize
      strh.write(le32(0xFFFFFFFFL)) // dwQuality: default
      strh.write(le32(0)) // dwSampleSize
      // rcFrame as four u16: left, top, right, bottom
      strh.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putShort(0).putShort(0)
        .putShort(width.toShort).putShort(height.toShort).array())
      val strf = new ByteArrayOutputStream() // BITMAPINFOHEADER
      strf.write(le32(40)) // biSize
      strf.write(le32(width.toLong))
      strf.write(le32(height.toLong))
      strf.write(le32(1L | (24L << 16))) // biPlanes=1, biBitCount=24
      strf.write(cc(codec)) // biCompression
      strf.write(le32(width.toLong * height * 3)) // biSizeImage
      (0 until 4).foreach(_ => strf.write(le32(0)))
      val strl = list("strl",
        chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
      val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)
      val moviBody = new ByteArrayOutputStream()
      val offsets = frames.map { f =>
        val off = 4 + moviBody.size() // relative to the 'movi' fourcc
        moviBody.write(chunk("00dc", f))
        off
      }
      val movi = list("movi", moviBody.toByteArray)
      val idx = new ByteArrayOutputStream()
      frames.zip(offsets).foreach { case (f, off) =>
        idx.write(cc("00dc"))
        idx.write(le32(0x10)) // AVIIF_KEYFRAME
        idx.write(le32(off.toLong))
        idx.write(le32(f.length.toLong))
      }
      val riffBody = cc("AVI ") ++ hdrl ++ movi ++
        chunk("idx1", idx.toByteArray)
      bb.write(cc("RIFF")); bb.write(le32(riffBody.length)); bb.write(riffBody)
      bb.toByteArray
    }
  }

  /** Frames per synthesized clip: 4 + id % 12 (4…15). */
  def synthFrameCount(id: Long): Int = (4L + id % 12L).toInt

  /** Per-frame REAL JPEG dimensions — a pure integer function of
    * (clip id, frame index), VARYING across frames so the oracle
    * certifies every individual frame's JPEG header decode (a
    * constant size would let a chunk-walk bug hide behind
    * count·width arithmetic). MJPEG frames self-describe their size
    * in their SOF marker, so per-frame variation is container-legal.
    */
  def synthFrameDims(id: Long, f: Int): (Int, Int) =
    ((16L + ((id + f) % 4L) * 8L).toInt,
      (12L + ((id + 2L * f) % 3L) * 8L).toInt)

  /** Container-nominal (max) frame dimensions, carried in avih/strf. */
  val NominalW = 40
  val NominalH = 28

  /** 8 fps cadence. */
  val UsPerFrame = 125000L

  /** A reusable per-partition JPEG reader — the registry lookup in
    * `ImageIO.getImageReaders` costs more than a thumbnail header
    * parse, so the decode loops hoist ONE reader into mapPartitions
    * scope and `setInput` per frame ([[Multimodal.ImageIoCodec]]
    * stays the general per-call API for arbitrary formats).
    */
  private def jpegReader(): javax.imageio.ImageReader =
    javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()

  /** Header-only (w, h) of a JPEG via a reused reader — no pixel
    * materialization, the 100 TB metadata-pass shape.
    */
  private def jpegDims(
      reader: javax.imageio.ImageReader,
      jp: Array[Byte]): (Int, Int) = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(jp))
    try {
      reader.setInput(iis)
      (reader.getWidth(0), reader.getHeight(0))
    } finally iis.close()
  }

  /** Synthesize REAL AVI-MJPEG payloads, one clip per document id:
    * each frame is a genuine JPEG (imageio-encoded RGB gradient keyed
    * on (id, frame)) wrapped in a genuine RIFF/AVI container. The
    * decode path is therefore exercised against true container bytes
    * end to end. Partition-parallel 1→1 synthesis, no shuffle.
    */
  def synthAviAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    // one id-keyed exchange spreads clip synthesis+decode across all
    // cores (Multimodal.spreadIds — the fixture is a single parquet
    // split; measured 12.4 s single-task vs ~1 s spread at sf0.1)
    Multimodal.spreadIds(docs).as[Long].mapPartitions { it =>
      Multimodal.imageIoMemCache()
      // ONE JPEG writer per partition (this is what mapPartitions'
      // per-partition-init slot is FOR): ImageIO.write does a full
      // writer-registry lookup per call, which at a frame per call
      // costs more than the encode of a thumbnail-sized image
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpg").next()
      it.map { id =>
        val frames = (0 until synthFrameCount(id)).map { f =>
          val (w, h) = synthFrameDims(id, f)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val r = ((id * 31 + f * 7 + x) % 256).toInt
              val g = ((id * 17 + f * 11 + y) % 256).toInt
              val b = ((x + y + f) % 256)
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          val ios = new javax.imageio.stream
            .MemoryCacheImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(img)
          ios.flush()
          bos.toByteArray
        }
        Asset(id, "video/avi",
          AviMjpegCodec.write(frames, UsPerFrame, NominalW, NominalH))
      }
    }
  }

  /** Per-clip video features off the REAL parsed container. The
    * frame-dimension sums require every `00dc` JPEG to individually
    * header-decode — Σ over genuinely parsed frames, not
    * header-arithmetic.
    */
  final case class VideoClipFeatures(
      asset_id: Long,
      n_frames: Int,
      us_per_frame: Long,
      duration_ms: Long,
      width: Int,
      height: Int,
      sum_frame_w: Long,
      sum_frame_h: Long)

  def extractVideoFeatures(
      spark: SparkSession, assets: Dataset[Asset]): Dataset[VideoClipFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      Multimodal.imageIoMemCache()
      val reader = jpegReader()
      it.map { a =>
        val m = AviMjpegCodec.parse(a.payload)
        var sw = 0L
        var sh = 0L
        m.frames.foreach { jp =>
          val (fw, fh) = jpegDims(reader, jp)
          sw += fw; sh += fh
        }
        VideoClipFeatures(a.asset_id, m.totalFrames, m.usPerFrame,
          m.totalFrames.toLong * m.usPerFrame / 1000L,
          m.width, m.height, sw, sh)
      }
    }
  }

  /** One decoded frame row: cadence timestamp + the frame's REAL
    * JPEG-decoded dimensions.
    */
  final case class VideoFrameRow(
      asset_id: Long,
      frame_idx: Int,
      ts_ms: Long,
      frame_w: Int,
      frame_h: Int)

  /** Frame-cadence expansion off the real container: 1→N flatMap, one
    * row per `00dc` chunk at ts = idx·usPerFrame/1000, each frame's
    * dimensions read from its own JPEG SOF header. Partition-parallel,
    * no shuffle — the video-preprocessing twin of
    * [[Multimodal.sampleAudioWindows]].
    */
  def videoFrames(
      spark: SparkSession, assets: Dataset[Asset]): Dataset[VideoFrameRow] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      Multimodal.imageIoMemCache()
      val reader = jpegReader()
      it.flatMap { a =>
        val m = AviMjpegCodec.parse(a.payload)
        m.frames.iterator.zipWithIndex.map { case (jp, f) =>
          val (fw, fh) = jpegDims(reader, jp)
          VideoFrameRow(a.asset_id, f, f.toLong * m.usPerFrame / 1000L,
            fw, fh)
        }
      }
    }
  }
}

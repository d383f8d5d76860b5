package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted in
  * partition-parallel batches.
  *
  * The Spark-side architecture is real and tested — schema, typed
  * Dataset plumbing, `mapPartitions` batch shape, deterministic
  * feature extraction over raw bytes. The still-image codec is
  * pluggable behind [[ImageCodec]]: [[ImageIoCodec]] does real
  * PNG/JPEG decode with the JDK's own `javax.imageio` (no extra
  * dependency), while [[StubCodec]] remains the deterministic-fake
  * default for synthetic payloads (and stands in for the video/audio
  * container ops, whose libraries are not in this environment).
  * Swapping codecs changes no plan shape — `mapPartitions` amortizes
  * per-partition codec init (the expensive part at 100 TB) exactly
  * the same way.
  */
object Multimodal {

  /** An opaque media asset: payload bytes + typed metadata. */
  case class Asset(
      asset_id: Long,
      mime: String,
      payload: Array[Byte])

  /** Deterministic per-asset features extracted from raw bytes. */
  case class AssetFeatures(
      asset_id: Long,
      mime: String,
      n_bytes: Long,
      content_hash: String,
      width: Int,
      height: Int)

  /** The still-image codec surface the pipeline operators are generic
    * over. Implementations must be Serializable — instances ride into
    * `mapPartitions` closures. Two implementations ship:
    * [[StubCodec]] (deterministic fakes, works on any bytes — the
    * CI/oracle path) and [[ImageIoCodec]] (real PNG/JPEG decode via
    * the JDK's own `javax.imageio`, zero extra dependencies).
    */
  trait ImageCodec extends Serializable {
    /** Decode the payload's (width, height). */
    def decodeImage(payload: Array[Byte]): (Int, Int)
    /** Scale the payload to w×h and re-encode. */
    def resizeImage(payload: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** Deliberately-stubbed codec. Real deployments replace `decodeImage`
    * with an actual library call; everything around it (batching,
    * schema, determinism of the fake) is production plumbing.
    */
  object StubCodec extends ImageCodec {
    /** STUB: derives a deterministic fake (width, height) from the
      * payload bytes instead of decoding a real image.
      */
    def decodeImage(payload: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      (512 + (h & 0x3FF), 512 + ((h >>> 10) & 0x3FF))
    }

    def md5Hex(payload: Array[Byte]): String = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
      d.map("%02x".format(_)).mkString
    }

    /** STUB: fake clip duration derived from payload size (real codec:
      * container metadata read).
      */
    def durationMs(payload: Array[Byte]): Long = payload.length.toLong * 10L

    /** STUB: deterministic fake frame bytes for a timestamp (real
      * codec: seek + decode). Output depends on (payload, tsMs) only.
      */
    def frameAt(payload: Array[Byte], tsMs: Long): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(payload)
      md.update(java.nio.ByteBuffer.allocate(8).putLong(tsMs).array())
      md.digest()
    }

    /** STUB: deterministic fake resize (real codec: scale + re-encode).
      * Output depends on (payload, w, h) only.
      */
    def resizeImage(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      frameAt(payload, (w.toLong << 32) | h.toLong)
  }

  /** Real still-image codec on the JDK's `javax.imageio` — PNG, JPEG,
    * GIF, BMP with no dependency beyond the JRE. Dimension decode
    * reads only the header (the reader reports width/height without
    * materializing pixel data), which is what a 100 TB metadata pass
    * wants; resize materializes, scales bilinearly, and re-encodes as
    * PNG. Fails loudly on undecodable payloads — at scale, route
    * assets through a `mime` filter first or wrap with a quarantine
    * try/catch in the caller, rather than silently fabricating
    * dimensions (that is StubCodec's documented job).
    */
  object ImageIoCodec extends ImageCodec {
    def decodeImage(payload: Array[Byte]): (Int, Int) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "ImageIoCodec: no reader for payload bytes")
        val r = readers.next()
        try { r.setInput(iis); (r.getWidth(0), r.getHeight(0)) }
        finally r.dispose()
      } finally iis.close()
    }

    def resizeImage(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "ImageIoCodec: undecodable payload")
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** One sampled frame of a clip asset. */
  case class Frame(
      asset_id: Long,
      frame_idx: Int,
      ts_ms: Long,
      frame_bytes: Array[Byte])

  /** Build an asset table from the documents table, treating the UTF-8
    * text bytes as the opaque payload (the environment has no real
    * media files; the column types and plan shape are the point).
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("application/octet-stream").as("mime"),
      col("text").cast("binary").as("payload"))

  /** Frame sampling: each asset expands to one row per `everyMs` of
    * its (codec-reported) duration — the 1→N flatMap shape of video
    * preprocessing. Partition-parallel, no shuffle: output partitioning
    * follows the input, and a downstream `repartition` is only needed
    * if frame fan-out skews partition sizes (clip length ≫ average).
    */
  def sampleFrames(
      spark: SparkSession,
      assets: DataFrame,
      everyMs: Long = 1000L): Dataset[Frame] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.flatMap { a =>
        val dur = StubCodec.durationMs(a.payload)
        val n = math.max(1L, dur / everyMs).toInt
        (0 until n).iterator.map { i =>
          val ts = i.toLong * everyMs
          Frame(a.asset_id, i, ts, StubCodec.frameAt(a.payload, ts))
        }
      }
    }
  }

  /** Resize: payload → payload, schema-preserving, partition-parallel
    * (the codec call swaps for a real scaler with no plan change).
    */
  def resizeAssets(
      spark: SparkSession,
      assets: DataFrame,
      width: Int,
      height: Int,
      codec: ImageCodec = StubCodec): Dataset[Asset] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map(a => a.copy(payload = codec.resizeImage(a.payload, width, height)))
    }
  }

  /** Partition-parallel feature extraction: one codec instance per
    * partition, streamed row batches, no driver involvement. This is
    * the `mapInPandas` batch shape expressed natively in Scala.
    */
  def extractFeatures(
      spark: SparkSession,
      assets: DataFrame,
      codec: ImageCodec = StubCodec): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      // per-partition init goes here (codec contexts, model handles)
      it.map { a =>
        val (w, h) = codec.decodeImage(a.payload)
        AssetFeatures(
          asset_id = a.asset_id,
          mime = a.mime,
          n_bytes = a.payload.length.toLong,
          content_hash = StubCodec.md5Hex(a.payload),
          width = w,
          height = h)
      }
    }
  }
}

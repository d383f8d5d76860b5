package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted in
  * partition-parallel batches.
  *
  * The Spark-side architecture is real and tested — schema, typed
  * Dataset plumbing, `mapPartitions` batch shape, deterministic
  * feature extraction over raw bytes. The codec step itself is a
  * deliberate stub ([[StubCodec.decodeImage]]): the actual image/audio
  * libraries are not available in this environment, and swapping the
  * stub for a real decoder changes no plan shape — `mapPartitions`
  * amortizes per-partition codec init (the expensive part at 100 TB)
  * exactly the same way.
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

  /** Deliberately-stubbed codec. Real deployments replace `decodeImage`
    * with an actual library call; everything around it (batching,
    * schema, determinism of the fake) is production plumbing.
    */
  object StubCodec {
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
      height: Int): Dataset[Asset] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map(a => a.copy(payload = StubCodec.resizeImage(a.payload, width, height)))
    }
  }

  /** Partition-parallel feature extraction: one codec instance per
    * partition, streamed row batches, no driver involvement. This is
    * the `mapInPandas` batch shape expressed natively in Scala.
    */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      // per-partition init goes here (codec contexts, model handles)
      it.map { a =>
        val (w, h) = StubCodec.decodeImage(a.payload)
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

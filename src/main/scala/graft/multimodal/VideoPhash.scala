package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import Multimodal.Asset
import Video.AviMjpegCodec

/** Video near-duplicate detection — the last dedup-by-modality gap
  * (text: MinHash/containment; image: [[Phash]]; audio: exact
  * waveform): per-frame perceptual hashes over REALLY-decoded AVI
  * containers, collapsed to one 64-bit clip signature by per-bit
  * majority consensus, then the SAME banded radius-3 join as the
  * image family — a re-encoded, lightly-edited, or re-containered
  * clip lands within a few Hamming bits of its original.
  *
  * Container honesty: [[synthPngAviAssets]] writes genuine RIFF/AVI
  * containers ([[Video.AviMjpegCodec]]) whose `00dc` frames carry
  * LOSSLESS grayscale PNGs under the registered `MPNG` (motion-PNG)
  * fourcc — decode walks the real chunk tree and really decodes each
  * frame with `javax.imageio`, and because PNG round-trips exactly,
  * the frame rasters equal the synthesis lattice, so the DuckDB
  * oracle replays every frame hash bit for bit (the
  * [[OraclePhash]]/WavCodec determinism discipline; MJPEG frames
  * would put a lossy codec's pixels between the engines). The
  * MJPEG pipeline ([[Video.synthAviAssets]]) remains the metadata
  * path; this is the content path.
  *
  * Signature robustness: bit i of the clip signature is the strict
  * majority of bit i across the clip's frame hashes. A k-bit edit to
  * ONE frame changes at most k frame-hash bits, and each changed
  * frame bit moves one majority count by one — so the signature
  * moves at most k bits, and the planted small-edit profile (the
  * [[Phash.synthPixel]] bump, measured ≤ 2 frame-hash bits) stays
  * inside the radius-3 banded join. Frame counts are kept ODD
  * ({3,5,7}) so majorities never tie: a tie-broken bit would sit at
  * the boundary where ANY single-frame change flips it, and (for the
  * synthetic corpus) an even-count `>` tie rule would bias signature
  * bits toward 0, skewing the 16-bit band histogram and multiplying
  * banded-join candidates ~8× (measured on the majority-of-4 shape).
  *
  * Scale: synthesis/decode/hash/signature are per-clip linear
  * `mapPartitions` with zero shuffle (the whole clip — container and
  * all its frames — is one row); the pair join is
  * [[Phash.neardupPairs]] on 4×16-bit signature bands, exact at
  * radius ≤ 3 by pigeonhole. The reference has no video operators
  * (its schemas are scalar POS fields); this is the
  * training-data-pipeline brief's modality completion.
  */
object VideoPhash {

  /** Frames per synthesized near-dup clip, keyed on the clip GROUP
    * (`gid = id / 2`) so a planted pair shares its frame count. Odd
    * on purpose — see the signature-robustness note above.
    */
  def synthFrames(id: Long): Int = (3L + 2L * ((id / 2L) % 3L)).toInt

  /** Which frame of the odd (planted near-dup) clip carries the
    * pixel edit.
    */
  def perturbedFrame(id: Long): Int =
    ((id / 2L) % synthFrames(id)).toInt

  /** The virtual [[Phash.synthPixel]] image id of (clip, frame):
    * frame f of clip id renders image-group `gid·16 + f` (f < 16 —
    * injective), with the perturbed frame of an odd clip taking the
    * group's odd (planted-edit) member. Every pixel rule, bump
    * position, and magnitude is therefore [[Phash.synthPixel]]
    * VERBATIM — the oracle reuses its certified lattice with a
    * frame-expanded source relation.
    */
  def frameImageId(id: Long, f: Int): Long = {
    val gid = id / 2L
    2L * (gid * 16L + f) +
      (if (id % 2L == 1L && f == perturbedFrame(id)) 1L else 0L)
  }

  /** 8 fps, matching the MJPEG synth. */
  val UsPerFrame: Long = Video.UsPerFrame

  /** One lossless-frame AVI clip per document id: genuine RIFF/AVI
    * (MPNG fourcc), each `00dc` frame a real 32×32 grayscale PNG of
    * the [[frameImageId]] lattice. Clips pair as (2k, 2k+1): the odd
    * clip is the even clip with ONE frame lightly edited — the
    * planted video near-duplicate. Partition-parallel 1→1 synthesis
    * after the pinned id spread, no shuffle.
    */
  def synthPngAviAssets(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    Multimodal.spreadIds(docs).as[Long].mapPartitions { it =>
      Multimodal.imageIoMemCache()
      // ONE PNG writer per partition (the Video.synthAviAssets
      // discipline) — ImageIO.write pays a registry lookup per frame
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      it.map { id =>
        val frames = (0 until synthFrames(id)).map { f =>
          val vid = frameImageId(id, f)
          val img = new java.awt.image.BufferedImage(Phash.Side,
            Phash.Side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < Phash.Side) {
            var x = 0
            while (x < Phash.Side) {
              raster.setSample(x, y, 0, Phash.synthPixel(vid, x, y))
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(img)
          ios.flush()
          bos.toByteArray
        }
        Asset(id, "video/avi", AviMjpegCodec.write(frames, UsPerFrame,
          Phash.Side, Phash.Side, codec = "MPNG"))
      }
    }
  }

  final case class VideoFrameHash(
      asset_id: Long, frame_idx: Int, ph_hi: Long, ph_lo: Long)

  /** Decode one clip's frames to their pHash rows: real chunk walk,
    * real per-frame PNG decode, [[Phash.hashPixels]]. Fails loudly on
    * undecodable or wrong-sized frames.
    */
  private def clipHashes(
      reader: javax.imageio.ImageReader,
      a: Asset): Seq[(Int, (Long, Long))] = {
    val m = AviMjpegCodec.parse(a.payload)
    m.frames.zipWithIndex.map { case (png, f) =>
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(png))
      val img =
        try { reader.setInput(iis); reader.read(0) }
        finally iis.close()
      require(img != null,
        s"VideoPhash: undecodable frame $f of clip ${a.asset_id}")
      require(img.getWidth == Phash.Side && img.getHeight == Phash.Side,
        s"VideoPhash: expected ${Phash.Side}x${Phash.Side} frame, got " +
          s"${img.getWidth}x${img.getHeight} (resize first)")
      val raster = img.getRaster
      val px = new Array[Int](Phash.Side * Phash.Side)
      var y = 0
      while (y < Phash.Side) {
        var x = 0
        while (x < Phash.Side) {
          px(y * Phash.Side + x) = raster.getSample(x, y, 0)
          x += 1
        }
        y += 1
      }
      f -> Phash.hashPixels(px)
    }
  }

  /** Per-frame pHash rows — the frame-level certified surface. */
  def framePhash(spark: SparkSession, assets: Dataset[Asset]): Dataset[VideoFrameHash] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      Multimodal.imageIoMemCache()
      // ONE PNG reader per partition (the Video.jpegDims discipline)
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      it.flatMap { a =>
        clipHashes(reader, a).iterator.map { case (f, (hi, lo)) =>
          VideoFrameHash(a.asset_id, f, hi, lo)
        }
      }
    }
  }

  final case class VideoSignature(
      asset_id: Long, n_frames: Long, sig_hi: Long, sig_lo: Long)

  /** Per-clip majority-consensus signature: bit i is set iff a strict
    * majority of the clip's frame hashes set bit i. The whole clip is
    * one input row, so the consensus is computed locally — zero
    * shuffle.
    */
  def signature(spark: SparkSession, assets: Dataset[Asset]): Dataset[VideoSignature] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      Multimodal.imageIoMemCache()
      // ONE PNG reader per partition (the Video.jpegDims discipline)
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next()
      it.map { a =>
        val hs = clipHashes(reader, a)
        val n = hs.size
        val cnt = new Array[Int](64)
        hs.foreach { case (_, (hi, lo)) =>
          var i = 0
          while (i < 32) {
            if (((lo >> i) & 1L) == 1L) cnt(i) += 1
            if (((hi >> i) & 1L) == 1L) cnt(32 + i) += 1
            i += 1
          }
        }
        var sigHi = 0L
        var sigLo = 0L
        var i = 0
        while (i < 64) {
          if (2 * cnt(i) > n) {
            if (i < 32) sigLo |= 1L << i else sigHi |= 1L << (i - 32)
          }
          i += 1
        }
        VideoSignature(a.asset_id, n.toLong, sigHi, sigLo)
      }
    }
  }

  /** Near-duplicate clip pairs: the image family's banded radius-3
    * join ([[Phash.neardupPairs]]) over clip signatures — exact by
    * the same 4-band pigeonhole. Emits (id_1, id_2, hamming),
    * id_1 < id_2.
    */
  def neardupPairs(signatures: DataFrame, maxHamming: Int = 3): DataFrame =
    Phash.neardupPairs(
      signatures.select(col("asset_id"),
        col("sig_hi").as("ph_hi"), col("sig_lo").as("ph_lo")),
      "asset_id", maxHamming)
}

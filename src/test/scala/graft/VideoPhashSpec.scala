package graft

import graft.multimodal.{Phash, Video, VideoPhash}

/** Video content near-dup: lossless MPNG-in-AVI containers, per-frame
  * pHash, majority-consensus clip signatures, banded radius-3 pairing.
  */
class VideoPhashSpec extends SparkTestBase {
  import spark.implicits._

  test("MPNG AVI roundtrip is lossless: decoded frame rasters = synth rule") {
    val docs = Seq(0L, 1L, 5L, 42L).toDF("doc_id")
    VideoPhash.synthPngAviAssets(spark, docs).collect().foreach { a =>
      val m = Video.AviMjpegCodec.parse(a.payload)
      assert(m.totalFrames == VideoPhash.synthFrames(a.asset_id))
      assert(m.usPerFrame == VideoPhash.UsPerFrame)
      m.frames.zipWithIndex.foreach { case (png, f) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(png))
        val vid = VideoPhash.frameImageId(a.asset_id, f)
        (0 until 32).foreach(y => (0 until 32).foreach { x =>
          assert(img.getRaster.getSample(x, y, 0) ==
            Phash.synthPixel(vid, x, y),
            s"pixel mismatch clip=${a.asset_id} frame=$f ($x,$y)")
        })
      }
    }
  }

  test("frame counts are odd and the perturbed frame is in range") {
    (0L until 40L).foreach { id =>
      val n = VideoPhash.synthFrames(id)
      assert(n % 2 == 1 && n >= 3 && n <= 7)
      val pf = VideoPhash.perturbedFrame(id)
      assert(pf >= 0 && pf < n)
      // planted pairs share frame count (keyed on gid)
      assert(VideoPhash.synthFrames(2 * (id / 2)) ==
        VideoPhash.synthFrames(2 * (id / 2) + 1))
    }
  }

  test("only the odd clip's single perturbed frame differs from its twin") {
    val docs = Seq(6L, 7L).toDF("doc_id") // gid 3: F=5, pf=3
    val hs = VideoPhash.framePhash(spark,
        VideoPhash.synthPngAviAssets(spark, docs))
      .collect().map(h => (h.asset_id, h.frame_idx) -> ((h.ph_hi, h.ph_lo)))
      .toMap
    val pf = VideoPhash.perturbedFrame(7L)
    (0 until VideoPhash.synthFrames(6L)).foreach { f =>
      if (f == pf) assert(hs((6L, f)) != hs((7L, f)) ||
        // a perturbation CAN hash identically; what matters is that
        // the underlying pixels differ — assert on the lattice
        (0 until 32).exists(y => (0 until 32).exists(x =>
          Phash.synthPixel(VideoPhash.frameImageId(6L, f), x, y) !=
            Phash.synthPixel(VideoPhash.frameImageId(7L, f), x, y))))
      else assert(hs((6L, f)) == hs((7L, f)),
        s"unperturbed frame $f must hash identically across the pair")
    }
  }

  test("signature = strict per-bit majority of frame hashes") {
    val docs = Seq(4L, 9L, 12L).toDF("doc_id")
    val assets = VideoPhash.synthPngAviAssets(spark, docs)
    val frames = VideoPhash.framePhash(spark, assets).collect()
      .groupBy(_.asset_id)
    val sigs = VideoPhash.signature(spark, assets).collect()
    sigs.foreach { s =>
      val hs = frames(s.asset_id)
      assert(s.n_frames == hs.length.toLong)
      (0 until 64).foreach { i =>
        val cnt = hs.count { h =>
          val w = if (i < 32) h.ph_lo else h.ph_hi
          ((w >> (i % 32)) & 1L) == 1L
        }
        val bit =
          if (i < 32) (s.sig_lo >> i) & 1L else (s.sig_hi >> (i - 32)) & 1L
        assert(bit == (if (2 * cnt > hs.length) 1L else 0L),
          s"majority mismatch clip=${s.asset_id} bit=$i")
      }
    }
  }

  test("planted clip pairs stay within radius 3 and the banded join finds them") {
    val n = 60L
    val docs = (0L until n).toDF("doc_id")
    val sigs = VideoPhash.signature(spark,
      VideoPhash.synthPngAviAssets(spark, docs)).toDF()
    val got = VideoPhash.neardupPairs(sigs)
      .as[(Long, Long, Int)].collect()
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    (0L until n by 2).foreach(k => assert(gotPairs.contains((k, k + 1)),
      s"planted pair ($k, ${k + 1}) missed"))
    // and the banded join is EXACT vs brute force over the signatures
    val all = sigs.as[(Long, Long, Long, Long)].collect()
    val brute = (for {
      a <- all; b <- all if a._1 < b._1
      h = java.lang.Long.bitCount(a._3 ^ b._3) +
        java.lang.Long.bitCount(a._4 ^ b._4) if h <= 3
    } yield (a._1, b._1)).toSet
    assert(gotPairs == brute)
  }

  test("video ingest gate: batch parity vs union-find over signatures") {
    import org.apache.spark.sql.functions.col
    import graft.multimodal.Phash
    import graft.streaming.ImageIngest
    import spark.implicits._
    val docs = (0L until 80L).toDF("doc_id")
    val sigs = VideoPhash.signature(spark,
        VideoPhash.synthPngAviAssets(spark, docs)).toDF()
      .select(col("asset_id"), col("sig_hi").as("ph_hi"),
        col("sig_lo").as("ph_lo"))
      .localCheckpoint()
    val fl = sigs.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    val parent = scala.collection.mutable.Map(fl.map(f => f._1 -> f._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for { (i1, h1) <- fl; (i2, h2) <- fl if i1 < i2 && ham(h1, h2) <= 3 } {
      val (a, b) = (find(i1), find(i2)); if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val reps = fl.map(_._1).groupBy(find).map { case (_, m) => m.min }.toSet
    val keptAll = ImageIngest.gateBatch(spark, sigs,
      ImageIngest.emptyIndex(spark)).select("asset_id")
      .as[Long].collect().toSet
    assert(keptAll == reps)
  }

  test("codec rejects fourccs outside MJPG/MPNG") {
    val png = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    intercept[IllegalArgumentException] {
      Video.AviMjpegCodec.write(Seq(png), 125000L, 8, 8, codec = "XVID")
    }
  }
}

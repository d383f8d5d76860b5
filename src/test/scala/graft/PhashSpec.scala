package graft

import graft.multimodal.Phash

class PhashSpec extends SparkTestBase {
  import spark.implicits._

  test("PNG grayscale roundtrip is lossless: decoded raster = synth rule") {
    val docs = Seq(0L, 1L, 42L, 101L).toDF("doc_id")
    val assets = Phash.synthGrayPngAssets(spark, docs).collect()
    assets.foreach { a =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(a.payload))
      assert(img.getWidth == 32 && img.getHeight == 32)
      (0 until 32).foreach(y => (0 until 32).foreach { x =>
        assert(img.getRaster.getSample(x, y, 0) ==
          Phash.synthPixel(a.asset_id, x, y),
          s"pixel mismatch id=${a.asset_id} ($x,$y)")
      })
    }
  }

  test("hashPixels matches a direct non-separable integer DCT") {
    // independent O(n^4) reference implementation of the same lattice
    val id = 37L
    val px = Array.tabulate(1024)(i => Phash.synthPixel(id, i % 32, i / 32))
    val f = new Array[Long](64)
    for (u <- 0 until 8; v <- 0 until 8) {
      var acc = 0L
      for (y <- 0 until 32; x <- 0 until 32)
        acc += Phash.CosQ14(u)(y) * Phash.CosQ14(v)(x) * px(y * 32 + x)
      f(u * 8 + v) = acc
    }
    val med = f.sorted.apply(31)
    var hi = 0L; var lo = 0L
    for (i <- 0 until 64 if f(i) > med)
      if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
    assert(Phash.hashPixels(px) == ((hi, lo)))
  }

  test("planted near-duplicates stay within Hamming 3; hash is decode-real") {
    val n = 400L
    val docs = (0L until n).toDF("doc_id")
    val hashes = Phash.phash64(spark, Phash.synthGrayPngAssets(spark, docs))
      .collect().map(h => h.asset_id -> ((h.ph_hi, h.ph_lo))).toMap
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    val planted = (0L until n by 2).map(k => ham(hashes(k), hashes(k + 1)))
    val within = planted.count(_ <= 3)
    info(s"planted Hamming histogram: " +
      planted.groupBy(identity).view.mapValues(_.size).toMap.toSeq
        .sortBy(_._1).mkString(", "))
    assert(within >= (planted.size * 97) / 100,
      s"only $within/${planted.size} planted pairs within radius 3 " +
        s"(max ${planted.max})")
    // perturbation must not be a no-op for every pair (some planted
    // pairs should differ, or the near-dup query only tests equality)
    assert(planted.exists(_ > 0), "all planted pairs hash identically")
  }

  test("bandedSearch matches a brute-force band-candidacy top-k") {
    import org.apache.spark.sql.functions.col
    val n = 200L
    val docs = (0L until n).toDF("doc_id")
    val hs = Phash.phash64(spark, Phash.synthGrayPngAssets(spark, docs))
    val hl = hs.collect().map(h => h.asset_id -> ((h.ph_hi, h.ph_lo)))
    def bands(h: (Long, Long)): Seq[Long] = Seq(
      h._2 & 0xFFFFL, (h._2 >> 16) & 0xFFFFL,
      h._1 & 0xFFFFL, (h._1 >> 16) & 0xFFFFL)
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    val expected = (for {
      (p, hp) <- hl if p % 50 == 0
      ranked = hl.filter { case (c, hc) =>
          c != p && bands(hp).zip(bands(hc)).exists { case (x, y) => x == y }
        }.map { case (c, hc) => (ham(hp, hc), c) }
        .sortBy(identity).take(5).zipWithIndex
      ((h, c), i) <- ranked
    } yield (p, i + 1, h, c)).toSet
    val got = Phash.bandedSearch(hs.toDF(), col("asset_id") % 50 === 0, 5)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(got == expected)
  }

  test("neardupPairs banding is exact vs brute force at radius 3") {
    val n = 300L
    val docs = (0L until n).toDF("doc_id")
    val hashes = Phash.phash64(spark, Phash.synthGrayPngAssets(spark, docs))
    val hl = hashes.collect().map(h => h.asset_id -> ((h.ph_hi, h.ph_lo)))
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    val brute = (for {
      (i1, h1) <- hl; (i2, h2) <- hl if i1 < i2
      d = ham(h1, h2) if d <= 3
    } yield (i1, i2, d)).toSet
    val banded = Phash.neardupPairs(hashes.toDF())
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute)
    // planted recall: every planted pair the radius admits is found
    // (banding is exact, so only out-of-radius planted pairs may be
    // absent — and those must be rare)
    val found = (0L until n by 2).count(k =>
      banded.exists(p => p._1 == k && p._2 == k + 1))
    assert(found * 100 >= (n / 2) * 97,
      s"planted recall $found/${n / 2} below 97%")
  }
}

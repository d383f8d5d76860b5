package graft

import graft.multimodal.AudioPrint

class AudioPrintSpec extends SparkTestBase {
  import spark.implicits._

  test("WAV pair roundtrip is lossless: decoded samples = synth rule") {
    val docs = Seq(0L, 1L, 42L, 101L).toDF("doc_id")
    val assets = AudioPrint.synthWavPairAssets(spark, docs).collect()
    assert(assets.length == 4)
    assets.foreach { a =>
      val samples = AudioPrint.decodeSamples(a.payload)
      assert(samples.length == AudioPrint.synthSamples(a.asset_id / 2L),
        s"sample count mismatch id=${a.asset_id}")
      samples.indices.foreach { i =>
        assert(samples(i) == AudioPrint.synthSample(a.asset_id, i),
          s"sample mismatch id=${a.asset_id} i=$i")
      }
    }
  }

  test("odd ids differ from their even twin at exactly the planted positions") {
    val gid = 21L
    val n = AudioPrint.synthSamples(gid)
    val positions = (0 until AudioPrint.PerturbedSamples)
      .map(j => AudioPrint.perturbPos(gid, j, n)).toSet
    (0 until n).foreach { i =>
      val even = AudioPrint.synthSample(2 * gid, i)
      val odd = AudioPrint.synthSample(2 * gid + 1, i)
      if (positions.contains(i))
        assert(odd == math.min(32767, even + 8192 * (0 until 4).count(
          j => AudioPrint.perturbPos(gid, j, n) == i)),
          s"bump rule mismatch at $i")
      else assert(odd == even, s"unexpected perturbation at $i")
    }
  }

  test("fingerprint matches an independent windowed-energy reference") {
    val id = 37L
    val samples = Array.tabulate(AudioPrint.synthSamples(id / 2L))(
      i => AudioPrint.synthSample(id, i))
    val len = samples.length / 33
    // independent reference: per-window sums via grouped collections
    val le = (0 until 33).map(w =>
      samples.slice(w * len, (w + 1) * len).map(v => math.abs(v.toLong)).sum)
    val he = (0 until 33).map { w =>
      (w * len + 1 until (w + 1) * len)
        .map(i => math.abs(samples(i).toLong - samples(i - 1).toLong)).sum
    }
    var hi = 0L; var lo = 0L
    (0 until 32).foreach { b =>
      if (le(b) > le(b + 1)) lo |= 1L << b
      if (he(b) > he(b + 1)) hi |= 1L << b
    }
    assert(AudioPrint.fingerprint(samples) == ((hi, lo)))
    // both halves fit the non-negative 32-bit replay convention
    assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32))
  }

  test("planted near-duplicates stay within Hamming 3; fingerprint is decode-real") {
    val n = 400L
    val docs = (0L until n).toDF("doc_id")
    val fps = AudioPrint.audioprint64(spark,
        AudioPrint.synthWavPairAssets(spark, docs))
      .collect().map(f => f.asset_id -> ((f.fp_hi, f.fp_lo))).toMap
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    val planted = (0L until n by 2).map(k => ham(fps(k), fps(k + 1)))
    info(s"planted Hamming histogram: " +
      planted.groupBy(identity).view.mapValues(_.size).toMap.toSeq
        .sortBy(_._1).mkString(", "))
    val within = planted.count(_ <= 3)
    assert(within >= (planted.size * 97) / 100,
      s"only $within/${planted.size} planted pairs within radius 3 " +
        s"(max ${planted.max})")
    // perturbation must not be a no-op for every pair (some planted
    // pairs should differ, or the near-dup query only tests equality)
    assert(planted.exists(_ > 0), "all planted pairs hash identically")
    // distinct groups must be far apart or near-dup is vacuous:
    // adjacent-group fingerprints should disagree on many bits
    val cross = (0L until n - 2 by 2).map(k => ham(fps(k), fps(k + 2)))
    assert(cross.count(_ > 10) * 100 >= cross.size * 95,
      s"cross-group fingerprints too close (min ${cross.min})")
  }

  test("bandedSearch matches a brute-force band-candidacy top-k") {
    import org.apache.spark.sql.functions.col
    val n = 200L
    val docs = (0L until n).toDF("doc_id")
    val fps = AudioPrint.audioprint64(spark,
      AudioPrint.synthWavPairAssets(spark, docs)).toDF()
    val fl = fps.collect().map(r =>
      r.getAs[Long]("asset_id") -> ((r.getAs[Long]("fp_hi"), r.getAs[Long]("fp_lo"))))
    def bands(h: (Long, Long)): Seq[Long] = Seq(
      h._2 & 0xFFFFL, (h._2 >> 16) & 0xFFFFL,
      h._1 & 0xFFFFL, (h._1 >> 16) & 0xFFFFL)
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    val expected = (for {
      (p, hp) <- fl if p % 50 == 0
      ranked = fl.filter { case (c, hc) =>
          c != p && bands(hp).zip(bands(hc)).exists { case (x, y) => x == y }
        }.map { case (c, hc) => (ham(hp, hc), c) }
        .sortBy(identity).take(5).zipWithIndex
      ((h, c), i) <- ranked
    } yield (p, i + 1, h, c)).toSet
    val got = AudioPrint.bandedSearch(fps, col("asset_id") % 50 === 0, 5)
      .as[(Long, Int, Int, Long)].collect().toSet
    assert(got == expected)
  }

  test("audio ingest gate: batch parity and cross-epoch drop vs union-find") {
    import org.apache.spark.sql.functions.col
    import graft.multimodal.Phash
    import graft.streaming.ImageIngest
    val n = 120L
    val docs = (0L until n).toDF("doc_id")
    val fps = AudioPrint.audioprint64(spark,
        AudioPrint.synthWavPairAssets(spark, docs)).toDF()
      .select(col("asset_id"), col("fp_hi").as("ph_hi"),
        col("fp_lo").as("ph_lo"))
      .localCheckpoint()
    val fl = fps.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    // independent union-find over the brute-force radius-3 graph
    val parent = scala.collection.mutable.Map(fl.map(f => f._1 -> f._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for { (i1, h1) <- fl; (i2, h2) <- fl if i1 < i2 && ham(h1, h2) <= 3 } {
      val (a, b) = (find(i1), find(i2)); if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val reps = fl.map(_._1).groupBy(find).map { case (_, m) => m.min }.toSet
    // batch parity: whole corpus against an empty index keeps exactly
    // the min-id representative of every component
    val keptAll = ImageIngest.gateBatch(spark, fps,
      ImageIngest.emptyIndex(spark)).select("asset_id")
      .as[Long].collect().toSet
    assert(keptAll == reps)
    // two-epoch: an epoch-1 component touching any epoch-0 clip is
    // dropped entirely (first-seen wins)
    val e0 = fps.filter(col("asset_id") % 3 === 0)
    val e1 = fps.filter(col("asset_id") % 3 =!= 0)
    val kept1 = ImageIngest.gateBatch(spark, e1,
        Phash.bandRows(e0).select(col("b"), col("v"),
          col("ph_hi"), col("ph_lo")))
      .select("asset_id").as[Long].collect().toSet
    val ids0 = fl.map(_._1).filter(_ % 3 == 0).toSet
    val ids1 = fl.map(_._1).filter(_ % 3 != 0)
    val fpm = fl.toMap
    // independent replay of the gate semantics over epoch 1 only
    val p1 = scala.collection.mutable.Map(ids1.map(i => i -> i): _*)
    def find1(x: Long): Long =
      if (p1(x) == x) x else { val r = find1(p1(x)); p1(x) = r; r }
    for { i1 <- ids1; i2 <- ids1 if i1 < i2 && ham(fpm(i1), fpm(i2)) <= 3 } {
      val (a, b) = (find1(i1), find1(i2)); if (a != b) p1(math.max(a, b)) = math.min(a, b)
    }
    val seen1 = ids1.filter(i => ids0.exists(j => ham(fpm(i), fpm(j)) <= 3)).toSet
    val badComp = ids1.filter(i => seen1.contains(i)).map(find1).toSet
    val expected1 = ids1.groupBy(find1).collect {
      case (c, m) if !badComp.contains(c) => m.min
    }.toSet
    assert(kept1 == expected1)
  }

  test("neardupPairs banding is exact vs brute force at radius 3") {
    val n = 300L
    val docs = (0L until n).toDF("doc_id")
    val fps = AudioPrint.audioprint64(spark,
      AudioPrint.synthWavPairAssets(spark, docs))
    val fl = fps.collect().map(f => f.asset_id -> ((f.fp_hi, f.fp_lo)))
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2)
    val brute = (for {
      (i1, h1) <- fl; (i2, h2) <- fl if i1 < i2
      d = ham(h1, h2) if d <= 3
    } yield (i1, i2, d)).toSet
    val banded = AudioPrint.neardupPairs(fps.toDF())
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == brute)
    val found = (0L until n by 2).count(k =>
      banded.exists(p => p._1 == k && p._2 == k + 1))
    assert(found * 100 >= (n / 2) * 97,
      s"planted recall $found/${n / 2} below 97%")
  }
}

package graft.multimodal

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import Multimodal.Asset

/** Audio perceptual fingerprinting — the audio-modality twin of
  * [[Phash]] image near-dup: two clips that differ by a few small
  * sample edits land within a few Hamming bits of each other, so
  * audio near-duplicate detection becomes the SAME banded 64-bit
  * join the image and video families use ([[Phash.neardupPairs]] —
  * 4×16-bit pigeonhole bands, exact at radius 3), never an
  * all-pairs waveform compare.
  *
  * Public algorithm family: Haitsma & Kalker, "A Highly Robust
  * Audio Fingerprinting System" (ISMIR 2002) — frame the signal
  * into windows, compute per-window band energies, and emit one bit
  * per adjacent-window energy DELTA (the sign of the difference is
  * far more stable under distortion than the energy itself). This
  * implementation keeps the delta-sign construction but swaps the
  * FFT filterbank for two integer-exact band proxies, so the whole
  * chain replays in DuckDB with zero float ops (the [[Phash]] Q14
  * determinism discipline):
  *
  *  - low band:  `L[w] = Σ |s_i|` over window w (overall energy);
  *  - high band: `H[w] = Σ |s_i − s_{i−1}|` within window w
  *    (first-difference energy — the discrete high-frequency
  *    content proxy; a pure tone has small Σ|Δ| per unit energy,
  *    broadband noise a large one).
  *
  * A clip of n samples is cut into 33 equal windows of `n/33`
  * samples (trailing remainder ignored — both engines floor the
  * same way), giving 32 adjacent-window deltas per band:
  * fp_lo bit w = `L[w] > L[w+1]`, fp_hi bit w = `H[w] > H[w+1]`.
  * All sums sit far inside long: |s| ≤ 32768, windows ≤ 485
  * samples → `L, H ≤ 485·65536 ≈ 3.2e7`.
  *
  * The decode path is REAL: [[synthWavPairAssets]] writes genuine
  * RIFF/WAVE containers through `javax.sound.sampled` and
  * [[audioprint64]] parses them back through the same library
  * (header → format check, streamed PCM → sample array), so a
  * frame miscount, byte-order, or sign-extension bug breaks the
  * oracle hash — the [[Multimodal.WavCodec]] certification carried
  * to sample granularity.
  *
  * Planted truth (the [[Phash]] (2k, 2k+1) convention): documents
  * pair up as (even, odd) over a shared waveform group
  * `gid = id/2`; the odd member bumps [[PerturbedSamples]] samples
  * by `+8192·hits` (clamped at 32767). The bump moves any window
  * sum by ≤ 32768 while adjacent-window sums of the noise-like
  * waveform differ by ~2e5 typically (σ ≈ 2.1e5), so planted pairs
  * measure Hamming 0–2 (modeled over 300 groups: 93% at 0, none
  * past 3 — a REAL spread, not fingerprint equality in disguise)
  * while distinct groups disagree on ~half their 64 bits.
  *
  * Scale: fingerprinting is per-clip `mapPartitions` (no shuffle);
  * pairing reuses the pigeonhole band join. The reference has no
  * audio operators (scalar POS fields only —
  * `secondDataPipeline/kafka_consumer/kafka_consumer.py`); this is
  * the training-data-pipeline brief's dedup-by-modality family.
  */
object AudioPrint {

  /** Windows per clip: 33 windows → 32 delta bits per band. */
  val Windows = 33

  /** Planted-perturbation sample count (the image family's 4-pixel
    * convention at audio grain).
    */
  val PerturbedSamples = 4

  /** Base (pre-perturbation) sample i of waveform group `gid`: the
    * low 16 bits of the CUBE of `m = (gid·1000003 + i + 1) mod 1e9+7`,
    * shifted to signed — the [[Phash.basePixel]] cubic-residue field
    * at sample grain. NOISE-LIKE on purpose: the first attempt reused
    * [[Multimodal.synthWavAssets]]'s affine recurrence
    * `(gid·40503 + i·2654435761) mod 65536`, which is an arithmetic
    * progression mod 2¹⁶ — a LOW-DISCREPANCY sawtooth whose window
    * energy sums concentrate, so adjacent-window gaps collapse and
    * 500 clips already produced ~190 accidental radius-3 pairs
    * (0.15% of cross-group pairs — the band join goes quadratic at
    * corpus scale, the exact failure [[Phash.basePixel]]'s doc
    * records for images). The cubic residue makes window sums behave
    * like iid uniform: gaps ~2e5 (σ ≈ 2.1e5) vs the ≤ 32768 planted
    * bump, zero accidental pairs at test scales. `m < 1e9+7`, so `m²·m` stays
    * under ~1e18 — exact in both long and DuckDB BIGINT.
    */
  def baseSample(gid: Long, i: Int): Int = {
    val m = (gid * 1000003L + i + 1L) % 1000000007L
    ((m * m % 1000000007L) * m % 1000000007L % 65536L - 32768L).toInt
  }

  /** Group `gid`'s clip length in samples (1–2 s at 8 kHz): the
    * existing audio-synth shape, keyed by group.
    */
  def synthSamples(gid: Long): Int = (8000L + gid % 8000L).toInt

  /** Perturbed sample position j (0..3) for group `gid` within a
    * clip of n samples.
    */
  def perturbPos(gid: Long, j: Int, n: Int): Int =
    ((gid * 131L + j.toLong * 8191L) % n.toLong).toInt

  /** Final sample value for document `id` at index i: base for even
    * ids; `min(32767, base + 8192·hits)` for odd ids, where `hits`
    * counts the perturbation positions landing on i (position
    * collisions stack, mirroring [[Phash.synthPixel]]).
    */
  def synthSample(id: Long, i: Int): Int = {
    val gid = id / 2L
    val n = synthSamples(gid)
    val v = baseSample(gid, i)
    if (id % 2L == 0L) v
    else {
      var k = 0
      var j = 0
      while (j < PerturbedSamples) {
        if (perturbPos(gid, j, n) == i) k += 1
        j += 1
      }
      if (k == 0) v else math.min(32767, v + 8192 * k)
    }
  }

  /** Write one REAL mono 16-bit PCM WAV per document id, pair-keyed
    * by `gid = id/2` with the odd member perturbed. Partition-
    * parallel 1→1 after the [[Multimodal.spreadIds]] exchange (the
    * single-split fixture serializes the codec loop otherwise).
    */
  def synthWavPairAssets(
      spark: SparkSession,
      docs: DataFrame,
      rate: Int = 8000): Dataset[Asset] = {
    import spark.implicits._
    Multimodal.spreadIds(docs).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = synthSamples(id / 2L)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = synthSample(id, i)
          pcm(2 * i) = (v & 0xFF).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        // SoundIo, not AudioSystem.write: the static entry point's
        // per-call provider lookup holds a GLOBAL class lock that
        // serialized the 32-thread synth stage (Multimodal.SoundIo)
        Multimodal.SoundIo.writeWave(ais, bos)
        Asset(id, "audio/wav", bos.toByteArray)
      }
    }
  }

  /** REAL WAV decode → signed 16-bit sample array. Same container
    * walk as [[Multimodal.WavCodec]] (format gate, streamed PCM),
    * but yielding samples instead of aggregate stats — the
    * fingerprint needs window grain. Fails loudly on anything but
    * 16-bit signed LE PCM (the quarantine discipline).
    */
  def decodeSamples(payload: Array[Byte]): Array[Int] = {
    // SoundIo, not AudioSystem: identical providers and parse, minus
    // the per-call global provider lock (measured: 29/32 executor
    // threads BLOCKED on JSSecurityManager during the decode stage)
    val ais = Multimodal.SoundIo.audioInputStream(payload)
    try {
      val f = ais.getFormat
      require(
        f.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16 && !f.isBigEndian &&
          f.getChannels == 1,
        s"AudioPrint: only mono 16-bit signed LE PCM supported, got $f")
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = (((bytes(2 * i + 1).toInt << 8) |
          (bytes(2 * i) & 0xFF)).toShort).toInt
        i += 1
      }
      out
    } finally ais.close()
  }

  /** The 64-bit audio fingerprint of a decoded sample array, split
    * into two non-negative 32-bit halves (the [[Phash.hashPixels]]
    * hi/lo replay convention): fp_lo bit w = `L[w] > L[w+1]`
    * (energy deltas), fp_hi bit w = `H[w] > H[w+1]`
    * (first-difference-energy deltas), over [[Windows]] equal
    * windows of `n/33` samples.
    */
  def fingerprint(samples: Array[Int]): (Long, Long) = {
    val n = samples.length
    val len = n / Windows
    require(len >= 1, s"clip too short to fingerprint: $n samples")
    val le = new Array[Long](Windows)
    val he = new Array[Long](Windows)
    var w = 0
    while (w < Windows) {
      val start = w * len
      val end = start + len
      var i = start
      while (i < end) {
        le(w) += math.abs(samples(i).toLong)
        if (i != start)
          he(w) += math.abs(samples(i).toLong - samples(i - 1).toLong)
        i += 1
      }
      w += 1
    }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < Windows - 1) {
      if (le(b) > le(b + 1)) lo |= 1L << b
      if (he(b) > he(b + 1)) hi |= 1L << b
      b += 1
    }
    (hi, lo)
  }

  /** Per-clip fingerprint row. */
  final case class AudioFingerprint(asset_id: Long, fp_hi: Long, fp_lo: Long)

  /** REAL decode → windowed integer band energies → 64-bit delta
    * fingerprint, per partition, no shuffle.
    */
  def audioprint64(
      spark: SparkSession,
      assets: Dataset[Asset]): Dataset[AudioFingerprint] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val (hi, lo) = fingerprint(decodeSamples(a.payload))
        AudioFingerprint(a.asset_id, hi, lo)
      }
    }
  }

  /** Near-duplicate clip pairs: the image family's exact banded
    * radius-3 Hamming join ([[Phash.neardupPairs]]) over audio
    * fingerprints — same pigeonhole bands, same verification
    * filter, same emit-once shape. Emits (id_1, id_2, hamming).
    */
  def neardupPairs(fingerprints: DataFrame, maxHamming: Int = 3): DataFrame =
    Phash.neardupPairs(
      fingerprints.select(col("asset_id"),
        col("fp_hi").as("ph_hi"), col("fp_lo").as("ph_lo")),
      maxHamming = maxHamming)

  /** Audio similarity search: [[Phash.bandedSearch]] (banded
    * multi-probe candidacy + bounded-heap top-k) over audio
    * fingerprints. Emits (probe_id, rank, hamming, cand_id).
    */
  def bandedSearch(
      fingerprints: DataFrame,
      probePred: org.apache.spark.sql.Column,
      k: Int): DataFrame =
    Phash.bandedSearch(
      fingerprints.select(col("asset_id"),
        col("fp_hi").as("ph_hi"), col("fp_lo").as("ph_lo")),
      probePred, k)
}

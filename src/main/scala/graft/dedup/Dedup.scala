package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Document deduplication operators: exact, MinHash+LSH, SimHash, and
  * exact n-gram Jaccard.
  *
  * Scale design (100 TB corpus):
  *  - exact dedup: one hash-shuffle on the 16-byte fingerprint, never
  *    on the document text;
  *  - MinHash: the signature (k longs) is computed map-side from the
  *    shingle set — the only shuffled payload is (doc_id, band_hash,
  *    signature), independent of document size;
  *  - LSH banding: candidate generation is a self-join *within* band
  *    buckets, so its cost is Σ bucket² — bounded by capping
  *    pathological buckets (`maxBucket`), the standard skew guard;
  *  - exact Jaccard is reserved for candidate verification, never run
  *    all-pairs at scale (the all-pairs form exists for small inputs
  *    and as the correctness oracle for the approximate paths).
  */
object Dedup {

  /** Word n-gram shingles (distinct). Documents shorter than n tokens
    * contribute their whole token sequence as a single shingle.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(
          sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array(array_join(toks, " "))))
  }

  /** Exact dedup by content fingerprint: one row per distinct text,
    * keeping the smallest doc_id (deterministic winner).
    * One shuffle, keyed on the 16-byte md5 — never on the text.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextOps.fingerprint(col(textCol)).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  // ---------------------------------------------------------------
  // MinHash + LSH
  // ---------------------------------------------------------------

  /** Universal-hash parameters (a·h + b mod P over a 32-bit base hash).
    * Fixed seed ⇒ signatures are deterministic across runs/executors.
    * P is the smallest prime > 2^32; a < 2^31 and h < 2^32 keep the
    * product under 2^63 (no silent long overflow).
    */
  private val P = 4294967311L
  private val HashSpace = 4294967296L // 2^32
  private def perms(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)((rnd.nextInt(Int.MaxValue - 1).toLong + 1,
                 rnd.nextInt(Int.MaxValue).toLong))
  }

  /** k-element MinHash signature of a shingle array: for each
    * permutation i, min over shingles of (aᵢ·xxhash64(s) + bᵢ) mod P.
    * Pure expression tree — computed map-side, no shuffle.
    */
  def minhashSignature(shingleArr: Column, k: Int): Column = {
    val base = transform(shingleArr, s => pmod(xxhash64(s), lit(HashSpace)))
    array(perms(k).map { case (a, b) =>
      aggregate(base, lit(Long.MaxValue),
        (acc, h) => least(acc, pmod(h * lit(a) + lit(b), lit(P))))
    }: _*)
  }

  /** MinHash-LSH near-duplicate pairs.
    *
    * @param numHashes signature length k
    * @param bands     b bands of r = k/b rows: a pair becomes a
    *                  candidate if any band matches; P(candidate) =
    *                  1-(1-j^r)^b
    * @param threshold minimum estimated Jaccard (fraction of agreeing
    *                  signature positions) for an emitted pair
    * @param maxBucket skew guard: LSH buckets larger than this are
    *                  dropped (a degenerate shingle — e.g. boilerplate
    *                  — would otherwise make one bucket quadratic)
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8,
      maxBucket: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands

    val signed = docs.select(
      col(idCol).as("doc_id"),
      minhashSignature(shingles(col(textCol), shingleLen), numHashes)
        .as("sig"))

    // band key: position-tagged so band i only collides with band i
    val bandKeys = array((0 until bands).map { i =>
      concat_ws(",", lit(i.toString) +:
        (0 until r).map(j => col("sig").getItem(i * r + j).cast("string")): _*)
    }: _*)
    val banded = signed.select(
      col("doc_id"), col("sig"), explode(bandKeys).as("band_key"))

    // skew guard: drop degenerate buckets before the self-join
    val bucketed = banded
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_key"))))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")

    val a = bucketed.select(
      col("band_key"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = bucketed.select(
      col("band_key"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))

    a.join(b, Seq("band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b")
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("est_jaccard",
        aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, lit(1)).otherwise(lit(0))),
          lit(0), (acc, v) => acc + v).cast("double") / lit(numHashes.toDouble))
      .filter(col("est_jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  // ---------------------------------------------------------------
  // Exact n-gram Jaccard (all-pairs form: oracle / verification path)
  // ---------------------------------------------------------------

  /** Exact word-n-gram Jaccard similarity pairs ≥ threshold.
    *
    * explode-shingles → self-join on shingle → |A∩B| per pair →
    * j = common / (|A|+|B|−common). Integer counts divide to bitwise-
    * identical doubles on any engine, so this is the cross-engine-
    * checkable ground truth for the MinHash path. All-pairs on shared
    * shingles — quadratic in bucket size, so at scale this runs only
    * on LSH candidates.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(
      col(idCol).as("doc_id"),
      shingles(col(textCol), shingleLen).as("sh"))
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val expl = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val common = expl.as("x").join(expl.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), Seq("doc_b"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------

  /** 64-bit SimHash over word-3-gram shingle hashes (majority vote per
    * bit), via the native Catalyst expression
    * [[graft.functions.SimHash64]]. Shingles rather than unigrams:
    * unigram SimHash is order-insensitive and collapses any two
    * documents sharing vocabulary; shingles track local word order,
    * aligning the measure with n-gram Jaccard.
    * Near-dup = small Hamming distance (`bit_count(a ^ b)`).
    */
  def simhash(text: Column, shingleLen: Int = 3): Column =
    graft.functions.GraftFunctions.simhash64(
      transform(shingles(text, shingleLen), t => xxhash64(t)))

  /** SimHash near-duplicate pairs with Hamming distance ≤ maxDist.
    * Candidate generation by banding the 64-bit hash into 8 × 8-bit
    * chunks (pigeonhole: a pair within distance ≤ 7 must agree on ≥ 1
    * chunk), then exact Hamming verification — same block/verify shape
    * as LSH.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 7): DataFrame = {
    val hashed = docs.select(
      col(idCol).as("doc_id"), simhash(col(textCol)).as("sh"))
    val chunkKeys = array((0 until 8).map { i =>
      concat_ws(":", lit(i.toString),
        shiftrightunsigned(col("sh"), 8 * i).bitwiseAND(lit(0xFFL))
          .cast("string"))
    }: _*)
    val banded = hashed.select(
      col("doc_id"), col("sh"), explode(chunkKeys).as("chunk_key"))
    val a = banded.select(col("chunk_key"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("chunk_key"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk_key"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
  }

  // ---------------------------------------------------------------
  // Embedding near-dup
  // ---------------------------------------------------------------

  /** Embedding-cosine near-duplicate pairs ≥ threshold (all-pairs
    * form; at scale, route through [[graft.similarity.Knn]] LSH
    * bucketing first).
    */
  def embeddingNearDup(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val e = embeddings.select(
      col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("v_a"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("v_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        graft.similarity.Knn.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}

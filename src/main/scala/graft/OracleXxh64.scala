package graft

/** DuckDB-SQL replay of Spark's `xxhash64` (XXH64, seed 42) — the
  * piece that moves the MinHash/SimHash queries from "recall-floored
  * estimate" to "hash-checked against the oracle": every signature
  * bit derives from xxhash64 of shingle strings, so replaying the
  * hash replays the whole operator.
  *
  * Technique: all arithmetic on the UNSIGNED 64-bit value carried in
  * a HUGEINT, reduced mod 2^64 after every step; 64×64→64 wrapping
  * multiplication via the 32-bit split
  * `(lo(a)·b + ((hi(a)·b mod 2^32) << 32)) mod 2^64` so no
  * intermediate exceeds HUGEINT range; rotations as
  * `(x·2^r mod 2^64) + (x div 2^(64−r))`; `xor` natively (positive
  * HUGEINTs < 2^64 xor correctly); the byte stream from `ord` per
  * char (the corpus is ASCII — same assumption as the winnowing
  * oracle). The 32-byte striped path folds a 4-lane HUGEINT-list
  * accumulator with `list_reduce`; the 8-byte/4-byte/1-byte tails
  * fold scalar accumulators. Validated value-identical to Spark's
  * xxhash64 on empty/short/exact-32/striped inputs and end-to-end on
  * the full corpus (q_minhash_est / q_simhash_pairs hash-green).
  */
object OracleXxh64 {

  private val M64 = "18446744073709551616::HUGEINT" // 2^64
  private val P1 = "11400714785074694791::HUGEINT" // 0x9E3779B185EBCA87
  private val P2 = "14029467366897019727::HUGEINT" // 0xC2B2AE3D27D4EB4F
  private val P3 = "1609587929392839161::HUGEINT" // 0x165667B19E3779F9
  private val P4 = "9650029242287828579::HUGEINT" // 0x85EBCA77C2B2AE63
  private val P5 = "2870177450012600261::HUGEINT" // 0x27D4EB2F165667C5

  /** (a·b) mod 2^64 without exceeding HUGEINT (32-bit split). */
  private def mm(a: String, b: String): String =
    s"((($a) % 4294967296::HUGEINT) * ($b) + " +
      s"(((($a) // 4294967296::HUGEINT) * ($b)) % 4294967296::HUGEINT)" +
      s" * 4294967296::HUGEINT) % $M64"

  private def rotl(x: String, r: Int): String =
    s"((($x) * ${1L << r}::HUGEINT) % $M64 + " +
      s"($x) // ${java.math.BigInteger.ONE.shiftLeft(64 - r)}::HUGEINT)"

  private def add(a: String, b: String): String = s"(($a) + ($b)) % $M64"

  private def shr(x: String, s: Int): String =
    s"(($x) // ${1L << s}::HUGEINT)"

  private def xor(a: String, b: String): String = s"xor($a, $b)"

  /** Little-endian word of width `w` bytes from 1-based position
    * expression `p` of byte-list column `bs`.
    */
  private def word(bs: String, p: String, w: Int): String =
    (0 until w).map(j => s"$bs[$p+$j] * ${1L << (8 * j)}::HUGEINT")
      .mkString("(", " + ", ")")

  private def stripeLane(v: String, k: String): String =
    mm(rotl(add(v, mm(k, P2)), 31), P1)

  private def mergeLane(h: String, v: String): String =
    add(mm(xor(h, mm(rotl(mm(v, P2), 31), P1)), P1), P4)

  /** CTE chain hashing every row of a prior CTE `e(doc_id, s)`:
    * emits `hx(doc_id, hu)` where `hu` is the UNSIGNED xxhash64 of
    * `s` — distinct per doc (each distinct STRING is hashed once
    * globally, then joined back; doc-level DISTINCT afterwards
    * mirrors ShingleHashes' hash-set semantics up to 64-bit
    * collisions, the engine's own documented tolerance).
    */
  def hashCtes: String = {
    val seed = "42::HUGEINT"
    val v10 = add(add(seed, P1), P2)
    val v20 = add(seed, P2)
    val v30 = seed
    val v40 = s"($seed + $M64 - $P1) % $M64"
    def lane(vi: Int, off: Int) =
      stripeLane(s"a[$vi]", word("x", off.toString, 8))
    val stripeLambda =
      s"(a, x) -> [${lane(1, 1)}, ${lane(2, 9)}, ${lane(3, 17)}, ${lane(4, 25)}]"
    var hLarge = s"(${add(
      add(rotl("stt[1]", 1), rotl("stt[2]", 7)),
      add(rotl("stt[3]", 12), rotl("stt[4]", 18)))})"
    (1 to 4).foreach(i => hLarge = mergeLane(hLarge, s"stt[$i]"))
    val tail8Lambda =
      s"(h, k) -> ${add(mm(rotl(xor("h",
        mm(rotl(mm("k", P2), 31), P1)), 27), P1), P4)}"
    val tail1Lambda =
      s"(h, b) -> ${mm(rotl(xor("h", mm("b", P5)), 11), P1)}"
    val h4 = add(mm(rotl(xor("h2", mm(word("bs", "i4", 4), P1)), 23), P2), P3)
    val av1 = xor("h3", shr("h3", 33))
    val av2 = mm(av1, P2)
    val av3 = xor(av2, shr(av2, 29))
    val av4 = mm(av3, P3)
    val av5 = xor(av4, shr(av4, 32))
    s"""
         dstr AS (SELECT DISTINCT s FROM e),
         xb0 AS (SELECT s, length(s) AS n,
           list_transform(range(length(s)),
             i -> ord(substr(s, CAST(i+1 AS INTEGER), 1))::HUGEINT) AS bs
           FROM dstr),
         xb2 AS (SELECT s, n, bs, n // 32 AS nst,
           CASE WHEN n >= 32 THEN
             (SELECT $hLarge FROM (SELECT list_reduce(
               [[$v10, $v20, $v30, $v40]] ||
               list_transform(range(n // 32),
                 si -> bs[CAST(32*si+1 AS INTEGER):CAST(32*si+32 AS INTEGER)]),
               $stripeLambda) AS stt))
           ELSE ${add(seed, P5)} END AS h0 FROM xb0),
         xb3 AS (SELECT s, n, bs, ${add("h0", "n::HUGEINT")} AS h1,
           CAST(32*nst AS INTEGER) AS i0 FROM xb2),
         xb4 AS (SELECT s, n, bs, i0 + 8*((n - i0) // 8) AS i4_off,
           list_reduce([h1] || list_transform(range((n - i0) // 8),
             wi -> ${word("bs", "i0 + 8*wi + 1", 8)}),
             $tail8Lambda) AS h2 FROM xb3),
         xb5 AS (SELECT s, n, bs, h2, CAST(i4_off + 1 AS INTEGER) AS i4,
           CASE WHEN n - i4_off >= 4 THEN 1 ELSE 0 END AS has4 FROM xb4),
         xb6 AS (SELECT s, n, bs,
           CASE WHEN has4 = 1 THEN $h4 ELSE h2 END AS h2b,
           CASE WHEN has4 = 1 THEN i4 + 4 ELSE i4 END AS ib FROM xb5),
         xb7 AS (SELECT s,
           list_reduce([h2b] || bs[CAST(ib AS INTEGER):CAST(n AS INTEGER)],
             $tail1Lambda) AS h3 FROM xb6),
         strh AS (SELECT s, $av5 AS hu FROM xb7),
         hx AS (SELECT DISTINCT e.doc_id, strh.hu
                FROM e JOIN strh ON e.s = strh.s)"""
  }

  /** The word-3-gram shingle CTEs (`t`, `g`, `e(doc_id, s)`) — the
    * q_ngram_jaccard_pairs gram construction, value-identical to
    * ShingleHashes' tokenize/join walk.
    */
  val shingleCtes: String =
    """WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') toks
           FROM documents),
         g AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
             THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                   for i in range(1, len(toks) - 1)]
             ELSE [array_to_string(toks, ' ')] END) sh FROM t),
         e AS (SELECT doc_id, unnest(sh) s FROM g),"""

  /** q_minhash_est replay: signatures as 64 universal hashes
    * `(a_j·(h mod 2^32) + b_j) mod P` over the doc's shingle-hash
    * set (params inlined from [[graft.functions.MinHashSignature]]'s
    * generator — fixed seed, so they are constants of the operator),
    * banding as SLICE EQUALITY on r=4 bands (the engine joins on
    * xxhash64 band keys — equal up to 64-bit key collisions, its own
    * documented tolerance; the maxBucket=10000 skew guard cannot
    * fire at sf0.01 where every bucket is ≤ n_docs = 500), then the
    * agreeing-position fraction ≥ 0.8.
    */
  def minhashEstSql: String = {
    val (pa, pb) = graft.functions.MinHashSignature.params(64)
    val paL = pa.mkString("[", ",", "]")
    val pbL = pb.mkString("[", ",", "]")
    shingleCtes + hashCtes + s""",
         perm AS (SELECT unnest(range(64)) AS j,
             unnest($paL) AS pa, unnest($pbL) AS pb),
         vals AS (SELECT doc_id, j,
             min(CAST((pa::HUGEINT * (hu % 4294967296::HUGEINT)
               + pb::HUGEINT) % 4294967311::HUGEINT AS BIGINT)) AS mn
           FROM hx CROSS JOIN perm GROUP BY doc_id, j),
         sig AS (SELECT doc_id, list(mn ORDER BY j) AS sg
                 FROM vals GROUP BY doc_id),
         bande AS (SELECT doc_id, i,
             sg[CAST(4*i+1 AS INTEGER):CAST(4*i+4 AS INTEGER)] AS bv
           FROM sig CROSS JOIN (SELECT unnest(range(16)) AS i)),
         cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
           FROM bande a JOIN bande b ON a.i = b.i AND a.bv = b.bv
             AND a.doc_id < b.doc_id),
         scored AS (SELECT doc_a, doc_b,
             list_sum(list_transform(range(64), j ->
               CASE WHEN sa.sg[CAST(j+1 AS INTEGER)] =
                 sb.sg[CAST(j+1 AS INTEGER)] THEN 1 ELSE 0 END)) AS agree
           FROM cand JOIN sig sa ON cand.doc_a = sa.doc_id
                     JOIN sig sb ON cand.doc_b = sb.doc_id)
         SELECT doc_a, doc_b,
           round(CAST(agree AS DOUBLE) / 64.0, 6) AS est_jaccard
         FROM scored WHERE CAST(agree AS DOUBLE) / 64.0 >= 0.8"""
  }

  /** q_simhash_pairs replay: per-doc 64-bit fingerprint by per-bit
    * majority vote over the shingle-hash set, then ALL pairs at
    * Hamming distance ≤ 7. The engine's 8×8-bit chunk banding is
    * pigeonhole-EXACT at maxDist 7 (≤7 differing bits leave ≥1 of 8
    * chunks identical), so all-pairs-with-distance-filter is the
    * same output, not an approximation of it.
    */
  def simhashPairsSql: String =
    shingleCtes + hashCtes + s""",
         sh64 AS (SELECT doc_id,
             CAST(list_sum(list_transform(range(64), b ->
               CASE WHEN list_sum(list_transform(list(hu), h ->
                 CASE WHEN (h // (CASE WHEN b = 63
                     THEN 9223372036854775808::HUGEINT
                     ELSE (1::HUGEINT << CAST(b AS INTEGER)) END)) % 2 = 1
                   THEN 1 ELSE -1 END)) > 0
                 THEN CASE WHEN b = 63 THEN -9223372036854775808::HUGEINT
                      ELSE (1::HUGEINT << CAST(b AS INTEGER)) END
               ELSE 0::HUGEINT END)) AS BIGINT) AS f
           FROM hx GROUP BY doc_id)
         SELECT a.doc_id doc_a, b.doc_id doc_b,
           CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming
         FROM sh64 a JOIN sh64 b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.f, b.f)) <= 7"""
}

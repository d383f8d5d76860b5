package graft

/** DuckDB-SQL replay of the approximate-NN surface — the piece that
  * moves the LSH/IVF queries from "recall-floored estimate" to
  * "hash-checked against the oracle". Approximation is not
  * nondeterminism: every one of these operators is a deterministic
  * function of its inputs (fixed-seed hyperplanes, lowest-id k-means
  * init, fixed iteration counts, total tie orders), so the oracle can
  * replay the EXACT candidate generation + rerank and the driver's
  * hash compare applies.
  *
  * Bit-exactness ground rules (shared with the q_knn_bruteforce /
  * q_kmeans_assign precedents):
  *  - every dot/norm is the engine's left-to-right 0.0-init fold,
  *    replayed as `list_reduce` (no-init list_reduce starts at the
  *    first product — `0.0 + x ≡ x` in IEEE for every product);
  *  - sqrt and division are correctly rounded in both engines;
  *  - argmax tie rules replay `java.lang.Double.compare(d, best) >= 0`
  *    over an ascending scan (ties to the LARGER index) as
  *    `row_number() OVER (ORDER BY d DESC, cell DESC)`;
  *  - per-cell centroid sums accumulate in vec_id order on the JVM
  *    (the driver-path training fold), replayed as a `list_reduce`
  *    over `list(u ORDER BY vec_id)` — the identical addition chain;
  *  - the random hyperplanes are SEED CONSTANTS
  *    ([[graft.functions.HyperplaneSignatures.planes]] — pure
  *    function of (dim, bits, tables, seed)), inlined as VALUES at
  *    SQL-build time so they can never drift from the engine.
  *
  * Scope notes: the k-means replays assume the ≤20k-vector
  * driver-side training path (`Ivf.train`'s bounded fast path —
  * holds at every verify scale; the treeAggregate path's float
  * reduction order is partition-dependent by design and is covered
  * by RECALL floors instead). The `-0.0 = 0.0` and NaN-comparison
  * edge cases of SQL ORDER BY differ from Double.compare in theory
  * but cannot arise on finite non-degenerate dots — the same
  * tolerance class as the 64-bit hash-collision notes on the LSH
  * band joins.
  */
object OracleAnn {

  // ---------------------------------------------------------------
  // shared fragments
  // ---------------------------------------------------------------

  /** Force every CTE to `AS MATERIALIZED`: DuckDB 1.0 INLINES CTEs by
    * default, and the unrolled training chains reference each `cen_i`
    * / `cb_i` twice — inlining doubles the plan per iteration
    * (2^iters blowup; the un-materialized IVF-PQ replay ran >10 min,
    * the materialized one runs in seconds). `" AS ("` only occurs at
    * CTE definitions in this generator (subqueries are `FROM (`).
    */
  private def materialized(sql: String): String =
    sql.replace(" AS (", " AS MATERIALIZED (")

  /** Left-fold dot product of two DOUBLE[] expressions. */
  private def dot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> p[1] * p[2]), (acc, x) -> acc + x)"

  /** Left-fold L2 norm of a DOUBLE[] expression. */
  private def nrm(a: String): String =
    s"sqrt(list_reduce(list_transform($a, x -> x * x), (acc, x) -> acc + x))"

  /** `embeddings` → (vec_id, v DOUBLE[], nrm) CTEs: `e0` all rows,
    * `g` the norm-filtered corpus, `q` the `vec_id < 5` query set.
    */
  private val baseCtes: String =
    s"""e0 AS (SELECT vec_id,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |       FROM embeddings),
       |en AS (SELECT vec_id, v, ${nrm("v")} AS nrm FROM e0),
       |g AS (SELECT vec_id, v, nrm FROM en WHERE nrm > 0),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM g
       |      WHERE vec_id < 5)""".stripMargin

  /** Inline the engine's hyperplane matrix as a `(tbl, bit, w)` VALUES
    * CTE — computed from the SAME pure function the native expression
    * uses, so the constants are in sync by construction.
    */
  private def planesCte(dim: Int, bits: Int, tables: Int, seed: Long): String = {
    val flat = graft.functions.HyperplaneSignatures.planes(dim, bits, tables, seed)
    val rows = for (t <- 0 until tables; b <- 0 until bits) yield {
      val off = (t * bits + b) * dim
      // `…e0`-suffixed so DuckDB parses each entry DIRECTLY as DOUBLE
      // (one correctly rounded conversion, bit-identical to the JVM
      // constant); a bare decimal literal parses as DECIMAL first and
      // reaches DOUBLE via the double-rounding int128/10^s path —
      // observed 1 ulp off on some values (OracleQuality sigmoid
      // table), which here could flip a sign bit on a near-zero dot.
      val lit = (0 until dim)
        .map { j =>
          val s = java.lang.Double.toString(flat(off + j))
          if (s.contains('E') || s.contains('e')) s else s + "e0"
        }
        .mkString("[", ", ", "]")
      s"($t, $b, $lit)"
    }
    s"planes(tbl, bit, w) AS (VALUES\n${rows.mkString(",\n")})"
  }

  /** Signature CTE: per (id, tbl) the packed sign-bit long — bit b set
    * iff the left-fold dot with plane (tbl, b) is `>= 0` (the
    * native expression's exact rule; `-0.0 >= 0` is true on both
    * engines).
    */
  private def sigCte(name: String, src: String, id: String, vec: String,
      bucketShift: Int): String =
    s"""${name}_d AS (SELECT s.$id, p.tbl, p.bit,
       |    ${dot(s"s.$vec", "p.w")} AS d
       |  FROM $src s CROSS JOIN planes p),
       |$name AS (SELECT $id, tbl,
       |    CAST(sum(CASE WHEN d >= 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
       |      + tbl * ${1L << bucketShift} AS bucket
       |  FROM ${name}_d GROUP BY $id, tbl)""".stripMargin

  // ---------------------------------------------------------------
  // q_knn_lsh — Knn.lshKnn(queries = vec_id<5, corpus, dim 64, k 10,
  //                        bits 6, tables 8, seed 7)
  // ---------------------------------------------------------------

  def knnLshSql: String = {
    val dim = 64; val bits = 6; val tables = 8; val seed = 7L; val k = 10
    materialized(s"""WITH $baseCtes,
       |${planesCte(dim, bits, tables, seed)},
       |${sigCte("cb", "g", "vec_id", "v", bits)},
       |${sigCte("qb", "q", "query_id", "qv", bits)},
       |qpr AS (SELECT query_id, bucket FROM qb
       |        UNION ALL
       |        SELECT query_id, xor(bucket, (1::BIGINT << f.i)) AS bucket
       |        FROM qb CROSS JOIN generate_series(0, ${bits - 1}) f(i)),
       |cand AS (SELECT DISTINCT p.query_id, c.vec_id
       |         FROM cb c JOIN qpr p USING (bucket)
       |         WHERE c.vec_id <> p.query_id),
       |scored AS (SELECT cand.query_id, cand.vec_id,
       |    round(${dot("q.qv", "g.v")} / (q.qn * g.nrm), 4) AS score
       |  FROM cand
       |  JOIN g ON g.vec_id = cand.vec_id
       |  JOIN q ON q.query_id = cand.query_id)
       |SELECT query_id, vec_id, score, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, vec_id) AS rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin)
  }

  // ---------------------------------------------------------------
  // q_embedding_neardup_lsh — Dedup.embeddingNearDupLsh(dim 64,
  //   threshold 0.4, bits 8, tables 12, maxBucket 100000, seed 7)
  // ---------------------------------------------------------------

  def neardupLshSql: String = {
    val dim = 64; val bits = 8; val tables = 12; val seed = 7L
    materialized(s"""WITH $baseCtes,
       |${planesCte(dim, bits, tables, seed)},
       |${sigCte("bk", "g", "vec_id", "v", bits)},
       |big AS (SELECT bucket FROM bk GROUP BY bucket
       |        HAVING count(*) > 100000),
       |apr AS (SELECT vec_id AS id_a, bucket FROM bk
       |        UNION ALL
       |        SELECT vec_id, xor(bucket, (1::BIGINT << f.i))
       |        FROM bk CROSS JOIN generate_series(0, ${bits - 1}) f(i)),
       |pairs AS (SELECT DISTINCT a.id_a, b.vec_id AS id_b
       |          FROM apr a JOIN bk b USING (bucket)
       |          WHERE a.id_a < b.vec_id
       |            AND bucket NOT IN (SELECT bucket FROM big)),
       |s AS (SELECT p.id_a, p.id_b,
       |    ${dot("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
       |  FROM pairs p
       |  JOIN g a ON a.vec_id = p.id_a
       |  JOIN g b ON b.vec_id = p.id_b)
       |SELECT id_a, id_b, round(cos, 4) AS cos FROM s WHERE cos >= 0.4""".stripMargin)
  }

  // ---------------------------------------------------------------
  // spherical k-means replay (Ivf.train, driver path): init = the
  // nlist lowest-id vectors unitized; each iteration assigns by
  // (dot DESC, cell DESC) argmax over UNIT vectors, sums per cell in
  // vec_id order, recenters (empty / zero-norm cell keeps its
  // centroid, else mean renormalized).
  // ---------------------------------------------------------------

  /** Chained CTEs from `uv(vec_id, u)` to `cen$iters(cell, w)`.
    * `nlistExpr` is a scalar SQL expression (constant or subquery).
    */
  private def kmeansCtes(nlistExpr: String, iters: Int): String = {
    val init =
      s"""uv AS (SELECT vec_id,
         |    CASE WHEN ${nrm("v")} = 0 THEN v
         |         ELSE list_transform(v, x -> x / ${nrm("v")}) END AS u
         |  FROM e0),
         |cen0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, u AS w
         |         FROM uv QUALIFY row_number() OVER (ORDER BY vec_id) <= ($nlistExpr))""".stripMargin
    val steps = (1 to iters).map { i =>
      val p = s"cen${i - 1}"
      s"""it${i}_d AS (SELECT t.vec_id, t.u, c.cell, ${dot("t.u", "c.w")} AS d
         |  FROM uv t CROSS JOIN $p c),
         |it${i}_a AS (SELECT vec_id, u, cell FROM (
         |    SELECT vec_id, u, cell, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d DESC, cell DESC) AS rn
         |    FROM it${i}_d) WHERE rn = 1),
         |it${i}_s AS (SELECT cell, count(*) AS n,
         |    list_reduce(list(u ORDER BY vec_id),
         |      (acc, x) -> list_transform(list_zip(acc, x), p -> p[1] + p[2])) AS sm
         |  FROM it${i}_a GROUP BY cell),
         |it${i}_m AS (SELECT c.cell, c.w AS w0,
         |    CASE WHEN s.cell IS NULL THEN NULL
         |         ELSE list_transform(s.sm, x -> x / CAST(s.n AS DOUBLE)) END AS mean
         |  FROM $p c LEFT JOIN it${i}_s s USING (cell)),
         |cen$i AS (SELECT cell,
         |    CASE WHEN mean IS NULL OR ${nrm("mean")} = 0 THEN w0
         |         ELSE list_transform(mean, x -> x / ${nrm("mean")}) END AS w
         |  FROM it${i}_m)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }

  // ---------------------------------------------------------------
  // q_knn_ivf — Ivf.ivfKnn(queries = vec_id<5, corpus, dim 64, k 10,
  //                        nlist 16, nprobe 4, iters 5)
  // ---------------------------------------------------------------

  def knnIvfSql: String = {
    val k = 10; val nprobe = 4
    materialized(s"""WITH $baseCtes,
       |${kmeansCtes("16", 5)},
       |ad AS (SELECT g.vec_id, c.cell, ${dot("g.v", "c.w")} AS d
       |       FROM g CROSS JOIN cen5 c),
       |asn AS (SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY d DESC, cell DESC) AS rn FROM ad) WHERE rn = 1),
       |qd AS (SELECT q.query_id, c.cell, ${dot("q.qv", "c.w")} AS d
       |       FROM q CROSS JOIN cen5 c),
       |qpr AS (SELECT query_id, cell FROM (
       |    SELECT query_id, cell, row_number() OVER (PARTITION BY query_id
       |      ORDER BY d DESC, cell DESC) AS rn FROM qd) WHERE rn <= $nprobe),
       |scored AS (SELECT q.query_id, g.vec_id,
       |    round(${dot("q.qv", "g.v")} / (q.qn * g.nrm), 4) AS score
       |  FROM qpr
       |  JOIN asn USING (cell)
       |  JOIN g ON g.vec_id = asn.vec_id
       |  JOIN q ON q.query_id = qpr.query_id
       |  WHERE g.vec_id <> q.query_id)
       |SELECT query_id, vec_id, score, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, vec_id) AS rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin)
  }

  // ---------------------------------------------------------------
  // q_knn_ivfpq — Ivf.ivfPqKnn(queries = vec_id<5, corpus, dim 64,
  //   k 10, nlist 16, nprobe 8, m 16, ksub 32; coarse iters 5,
  //   PQ iters 10 on the ≤20k lowest-id unitized sample)
  //
  // The PQ subspace dimension is 4, so every subspace dot replays as
  // an EXPLICIT left-associated sum (`p1 + p2 + p3 + p4` parses as
  // ((p1+p2)+p3)+p4 — the JVM fold, without per-row lambda overhead).
  // assignL2's augmented distance d = fold4(v·c) − 0.5·fold4(c·c) is
  // the same double as the encode path's 5-element ArgTopCells fold
  // (the 5th product is literally 1.0·aug), so one SQL form serves
  // both training and encoding.
  // ---------------------------------------------------------------

  def ivfPqSql: String = {
    val m = 16; val ksub = 32; val dsub = 4
    val nprobe = 8; val k = 10; val pqIters = 10
    def dot4(a: String, b: String): String =
      (1 to dsub).map(j => s"$a[$j] * $b[$j]").mkString(" + ")
    def sq4(c: String): String =
      (1 to dsub).map(j => s"$c[$j] * $c[$j]").mkString(" + ")
    def sliceAt(v: String, sExpr: String): String =
      s"list_slice($v, $sExpr * $dsub + 1, $sExpr * $dsub + $dsub)"
    val pqSteps = (1 to pqIters).map { i =>
      val p = s"cb${i - 1}"
      s"""pq${i}_d AS (SELECT v.vec_id, v.s, c.code, v.vs,
         |    (${dot4("v.vs", "c.c")}) + (-0.5 * (${sq4("c.c")})) AS d
         |  FROM sv v JOIN $p c ON c.s = v.s),
         |pq${i}_a AS (SELECT vec_id, s, code, vs FROM (
         |    SELECT vec_id, s, code, vs, row_number() OVER (
         |      PARTITION BY vec_id, s ORDER BY d DESC, code DESC) AS rn
         |    FROM pq${i}_d) WHERE rn = 1),
         |pq${i}_s AS (SELECT s, code, count(*) AS n,
         |    list_reduce(list(vs ORDER BY vec_id),
         |      (acc, x) -> list_transform(list_zip(acc, x), p -> p[1] + p[2])) AS sm
         |  FROM pq${i}_a GROUP BY s, code),
         |cb$i AS (SELECT c.s, c.code,
         |    CASE WHEN t.code IS NULL THEN c.c
         |         ELSE list_transform(t.sm, x -> x / CAST(t.n AS DOUBLE)) END AS c
         |  FROM $p c LEFT JOIN pq${i}_s t ON t.s = c.s AND t.code = c.code)""".stripMargin
    }
    materialized(s"""WITH $baseCtes,
       |${kmeansCtes("16", 5)},
       |asn AS (SELECT vec_id, cell FROM (
       |    SELECT g.vec_id, c.cell, row_number() OVER (PARTITION BY g.vec_id
       |      ORDER BY ${dot("g.v", "c.w")} DESC, c.cell DESC) AS rn
       |    FROM g CROSS JOIN cen5 c) WHERE rn = 1),
       |sm0 AS (SELECT vec_id, v FROM e0
       |        WHERE v IS NOT NULL AND len(v) = 64
       |        ORDER BY vec_id LIMIT 20000),
       |smp AS (SELECT vec_id,
       |    CASE WHEN ${nrm("v")} = 0 THEN v
       |         ELSE list_transform(v, x -> x / ${nrm("v")}) END AS u
       |  FROM sm0),
       |sample AS (SELECT vec_id, u FROM smp
       |           WHERE len(list_filter(u, x -> x <> 0.0)) > 0),
       |subs AS (SELECT s FROM generate_series(0, ${m - 1}) t(s)),
       |cb0 AS (SELECT subs.s, r.rn - 1 AS code, ${sliceAt("r.u", "subs.s")} AS c
       |        FROM (SELECT u, row_number() OVER (ORDER BY vec_id) AS rn
       |              FROM sample) r CROSS JOIN subs
       |        WHERE r.rn <= $ksub),
       |sv AS (SELECT vec_id, subs.s, ${sliceAt("u", "subs.s")} AS vs
       |       FROM sample CROSS JOIN subs),
       |${pqSteps.mkString(",\n")},
       |gu AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM g),
       |enc AS (SELECT vec_id, s, code FROM (
       |    SELECT v.vec_id, c.s, c.code, row_number() OVER (
       |      PARTITION BY v.vec_id, c.s ORDER BY
       |        (${dot4(s"${sliceAt("v.u", "c.s")}", "c.c")})
       |          + (-0.5 * (${sq4("c.c")})) DESC, c.code DESC) AS rn
       |    FROM gu v CROSS JOIN cb$pqIters c) WHERE rn = 1),
       |qpr AS (SELECT query_id, cell FROM (
       |    SELECT q.query_id, c.cell, row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY ${dot("q.qv", "c.w")} DESC, c.cell DESC) AS rn
       |    FROM q CROSS JOIN cen5 c) WHERE rn <= $nprobe),
       |lut AS (SELECT q.query_id, c.s, c.code,
       |    (${dot4(s"${sliceAt("q.qv", "c.s")}", "c.c")}) AS ld
       |  FROM q CROSS JOIN cb$pqIters c),
       |ca AS (SELECT p.query_id, a.vec_id
       |       FROM qpr p JOIN asn a USING (cell)
       |       WHERE a.vec_id <> p.query_id),
       |ads AS (SELECT ca.query_id, ca.vec_id,
       |    list_reduce(list(l.ld ORDER BY l.s), (acc, x) -> acc + x) AS adc
       |  FROM ca
       |  JOIN enc e2 ON e2.vec_id = ca.vec_id
       |  JOIN lut l ON l.query_id = ca.query_id AND l.s = e2.s
       |            AND l.code = e2.code
       |  GROUP BY ca.query_id, ca.vec_id),
       |scored AS (SELECT a.query_id, a.vec_id,
       |    round(a.adc / q.qn, 4) AS score
       |  FROM ads a JOIN q ON q.query_id = a.query_id)
       |SELECT query_id, vec_id, score, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, vec_id) AS rank
       |  FROM scored)
       |WHERE rank <= $k""".stripMargin)
  }

  // ---------------------------------------------------------------
  // q_embedding_neardup_ivf — Ivf.cellNearDup(dim 64, threshold 0.4,
  //   nlist auto ≈ ⌈√n⌉ clamped [8, 4096], nprobe 6, iters 5,
  //   maxCell 100000)
  // ---------------------------------------------------------------

  def neardupIvfSql: String = {
    val nprobe = 6
    val nlist =
      "SELECT greatest(8, least(4096, CAST(ceil(sqrt(count(*))) AS BIGINT))) FROM e0"
    materialized(s"""WITH $baseCtes,
       |${kmeansCtes(s"($nlist)", 5)},
       |ad AS (SELECT g.vec_id, c.cell, ${dot("g.v", "c.w")} AS d
       |       FROM g CROSS JOIN cen5 c),
       |asn AS (SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY d DESC, cell DESC) AS rn FROM ad) WHERE rn <= $nprobe),
       |big AS (SELECT cell FROM asn GROUP BY cell HAVING count(*) > 100000),
       |ok AS (SELECT * FROM asn WHERE cell NOT IN (SELECT cell FROM big)),
       |pairs AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |          FROM ok a JOIN ok b USING (cell)
       |          WHERE a.vec_id < b.vec_id),
       |s AS (SELECT p.id_a, p.id_b,
       |    ${dot("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
       |  FROM pairs p
       |  JOIN g a ON a.vec_id = p.id_a
       |  JOIN g b ON b.vec_id = p.id_b)
       |SELECT id_a, id_b, round(cos, 4) AS cos FROM s WHERE cos >= 0.4""".stripMargin)
  }
}

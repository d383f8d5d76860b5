package graft

/** DuckDB-SQL replay of [[graft.ops.Fusion.mmrRerank]] — the MMR
  * greedy selection unrolled round by round (the OracleBpe/OracleAnn
  * unrolled-iteration precedent).
  *
  * Each round is relational: the candidates not yet selected, their
  * max 4-dp-lattice cosine to the selected set (missing/zero-norm
  * vectors coalesce to 0 on both engines), the MMR expression
  * `λ·rel − (1−λ)·maxsim` as one fixed sequence of correctly-rounded
  * IEEE ops rounded to 9 dp, and a (score desc, id asc) argmax. The
  * λ and 1−λ literals are the ENGINE'S exact doubles inlined with the
  * `e0` direct-DOUBLE-parse suffix — `1.0 - 0.7` is
  * 0.30000000000000004 in IEEE arithmetic, and a re-typed "0.3" would
  * diverge in the last ulp. CTEs are MATERIALIZED: round r references
  * round r−1 twice (remaining + max-sim), which default inlining
  * would expand exponentially.
  */
object OracleMmr {

  /** Double literal that DuckDB parses DIRECTLY as DOUBLE (no
    * DECIMAL round-trip): Scala's shortest-repr toString plus an
    * exponent marker when none is present.
    */
  private def dbl(x: Double): String = {
    val s = x.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  /** Full replay: `candidateSql` must emit (qid, doc_id, rrf_score);
    * vectors come from the `embeddings` table keyed by vec_id.
    */
  def mmrSql(candidateSql: String, lambda: Double, k: Int): String = {
    require(k > 0, s"k must be positive, got $k")
    val l = dbl(lambda)
    val m = dbl(1.0 - lambda)
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    parts += s"hybrid AS MATERIALIZED (\n$candidateSql)"
    parts += """cand AS MATERIALIZED (
      |  SELECT qid, doc_id AS id, rrf_score AS rel FROM hybrid)""".stripMargin
    parts += """evp AS MATERIALIZED (
      |  SELECT id, v, n FROM (
      |    SELECT vec_id AS id, v,
      |      sqrt(list_reduce(list_transform(v, x -> x * x),
      |        (acc, x) -> acc + x)) AS n
      |    FROM (SELECT vec_id,
      |      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |      FROM embeddings))
      |  WHERE n > 0)""".stripMargin
    parts += """sim AS MATERIALIZED (
      |  SELECT c1.qid, c1.id AS i, c2.id AS j,
      |    round(list_reduce(list_transform(list_zip(e1.v, e2.v),
      |        p -> p[1] * p[2]), (acc, x) -> acc + x)
      |      / (e1.n * e2.n), 4) AS s
      |  FROM cand c1 JOIN cand c2 ON c1.qid = c2.qid AND c1.id <> c2.id
      |  JOIN evp e1 ON e1.id = c1.id
      |  JOIN evp e2 ON e2.id = c2.id)""".stripMargin
    parts += s"""sel1 AS MATERIALIZED (
      |  SELECT qid, id, round($l * rel, 9) AS mmr_score, 1 AS rank
      |  FROM (
      |    SELECT qid, id, rel, row_number() OVER (
      |      PARTITION BY qid ORDER BY rel DESC, id) AS rn
      |    FROM cand)
      |  WHERE rn = 1)""".stripMargin
    for (r <- 2 to k) {
      parts += s"""rem$r AS MATERIALIZED (
        |  SELECT c.* FROM cand c
        |  LEFT JOIN sel${r - 1} s ON s.qid = c.qid AND s.id = c.id
        |  WHERE s.id IS NULL)""".stripMargin
      parts += s"""ms$r AS MATERIALIZED (
        |  SELECT sim.qid, sim.i AS id, max(sim.s) AS ms
        |  FROM sim JOIN sel${r - 1} s
        |    ON s.qid = sim.qid AND s.id = sim.j
        |  GROUP BY 1, 2)""".stripMargin
      parts += s"""sel$r AS MATERIALIZED (
        |  SELECT * FROM sel${r - 1}
        |  UNION ALL
        |  SELECT qid, id, mmr AS mmr_score, $r AS rank FROM (
        |    SELECT t.qid, t.id, t.mmr, row_number() OVER (
        |      PARTITION BY t.qid ORDER BY t.mmr DESC, t.id) AS rn
        |    FROM (
        |      SELECT r.qid, r.id,
        |        round($l * r.rel - $m * coalesce(m.ms, 0e0), 9) AS mmr
        |      FROM rem$r r
        |      LEFT JOIN ms$r m ON m.qid = r.qid AND m.id = r.id) t)
        |  WHERE rn = 1)""".stripMargin
    }
    "WITH " + parts.mkString(",\n") +
      s"\nSELECT qid, CAST(rank AS INTEGER) AS rank, id AS doc_id," +
      s" mmr_score FROM sel$k"
  }
}

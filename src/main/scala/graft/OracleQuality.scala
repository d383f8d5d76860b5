package graft

import graft.text.QualityModel

/** DuckDB-SQL replay of the trainable quality classifier
  * ([[graft.text.QualityModel]]) — 15 unrolled batch-GD iterations,
  * weight for weight, which moves q_quality_model / q_quality_scores
  * from "golden-pinned" to hash-checked against the oracle.
  *
  * Why this is bit-replayable at all (the OracleAnn argument, applied
  * to training): every value in the run is produced by correctly
  * rounded IEEE ops over engine-identical inputs —
  *
  *  - the features are exact integer-quotient ratios plus
  *    transcendental-sourced columns snapped to a decimal lattice
  *    (`round(ln, 9)`, entropy at 6 dp — the q_lm_score / q_doc_entropy
  *    precedents);
  *  - the sigmoid is the 512-bin fastText-style lookup table: the
  *    entries are PLAN LITERALS (inlined below from the same
  *    [[QualityModel.SigmoidTable]] the engine reads), so no engine
  *    ever evaluates `exp` inside the loop;
  *  - gradient/stat partial sums go through round(·,9) →
  *    DECIMAL(28,12): exact, order-independent, identical lattice on
  *    both engines;
  *  - DECIMAL→double crossings use the explicit
  *    `unscaled(9) / 1e9` route ([[QualityModel.latticeDouble]] /
  *    [[decDbl]]) — one correctly rounded division of two exactly
  *    representable operands, never an engine-internal cast path;
  *  - scalar recurrences (weight updates, mean/scale, fold-back)
  *    replay the Scala loop's exact operation order as left-assoc
  *    SQL arithmetic.
  *
  * Engine anchors: [[QualityModel.train]] (stats pass, GD loop,
  * standardization fold-back), [[QualityModel.features]] (feature
  * definitions), SparkEntry.qualityWeights (iters = 15, lr = 0.8,
  * weak label `tokenCount >= 60`).
  */
object OracleQuality {

  private val D = 9
  private val Iters = 15
  private val Lr = "0.8"

  val FeatureNames: Seq[String] = Seq(
    "bias", "log_chars", "log_tokens", "punct_ratio", "digit_ratio",
    "upper_ratio", "entropy", "mean_token_len", "stopword_rate")

  /** Same CTE-materialization forcing as OracleAnn: the unrolled
    * iteration chain references each `it$i` twice; DuckDB's default
    * CTE inlining would blow the plan up 2^15-fold.
    */
  private def materialized(sql: String): String =
    sql.replace(" AS (", " AS MATERIALIZED (")

  /** The 513-entry sigmoid table as a DuckDB list literal — printed
    * with `Double.toString` (shortest round-trip form) plus an
    * exponent marker on plain-format entries: a bare `0.0154…`
    * parses as DECIMAL in DuckDB and reaches DOUBLE via the
    * double-rounding int128/10^s path (observed 1-ulp off on 2 of
    * 513 entries); `…e0` parses as DOUBLE directly — one correctly
    * rounded conversion, bit-identical to the JVM literal.
    */
  private val sigTableLit: String =
    QualityModel.SigmoidTable.map { v =>
      val s = java.lang.Double.toString(v)
      if (s.contains('E') || s.contains('e')) s else s + "e0"
    }.mkString("[", ", ", "]")

  /** Quantized sigmoid of a double expression — replays
    * [[QualityModel.sigmoid]]: clamp at ±8, truncating bin index
    * (Spark's double→int cast truncates toward zero; DuckDB's CAST
    * rounds, hence the explicit `trunc`), 1-based list lookup.
    * Requires `sig` (1 row, column `t`) in scope.
    */
  private def sig(x: String): String =
    s"(CASE WHEN ($x) <= -8.0 THEN 0.0 WHEN ($x) >= 8.0 THEN 1.0 " +
      s"ELSE sig.t[CAST(trunc((($x) + 8.0) * 32.0) AS INT) + 1] END)"

  /** Exact DECIMAL→double, the [[QualityModel.latticeDouble]] twin:
    * scale down to 9 (exact — the sum is on the 9-dp lattice), pull
    * the unscaled integer, one double division.
    */
  private def decDbl(e: String): String =
    s"(CAST(CAST(CAST($e AS DECIMAL(28,9)) * " +
      "CAST(1000000000 AS DECIMAL(10,0)) AS BIGINT) AS DOUBLE) " +
      "/ 1000000000.0)"

  /** round(·,9) → DECIMAL(28,12) partial-sum cell (the engine's
    * round-then-cast discipline).
    */
  private def latticeSum(e: String): String =
    s"sum(CAST(round($e, 9) AS DECIMAL(28,12)))"

  /** Feature CTEs over `documents`: per-doc entropy fold (the
    * q_doc_entropy replay, 6 dp), raw counts, then x0..x8 + label y.
    * Null text rows keep null features/label (train filters them,
    * scoring emits null — both mirroring the engine).
    */
  private val featCtes: String = {
    val stopRe = "\\b(" + QualityModel.Stopwords.mkString("|") + ")\\b"
    s"""sig AS (SELECT $sigTableLit AS t),
       |ch AS (SELECT doc_id, unnest(regexp_split_to_array(text, '')) c
       |       FROM documents),
       |ef AS (SELECT doc_id, c, count(*) k FROM ch
       |       WHERE c <> '' GROUP BY 1, 2),
       |es AS (SELECT doc_id, list_sort(list({'c': c, 'k': k})) arr,
       |           sum(k) n
       |       FROM ef GROUP BY 1),
       |entc AS (SELECT doc_id, round(0 - list_reduce(list_transform(arr,
       |        x -> (CAST(x.k AS DOUBLE) / n) * ln(CAST(x.k AS DOUBLE) / n)),
       |      (a, b) -> a + b), 6) AS ent
       |    FROM es),
       |base AS (SELECT d.doc_id, d.lang,
       |    CAST(length(d.text) AS DOUBLE) AS chars,
       |    CAST(len(regexp_extract_all(d.text, '\\S+')) AS DOUBLE) AS toks,
       |    len(regexp_extract_all(d.text, '\\S+')) AS itoks,
       |    CAST(len(regexp_extract_all(d.text, '[.,!?;:]')) AS DOUBLE)
       |      AS punct,
       |    CAST(len(regexp_extract_all(d.text, '[0-9]')) AS DOUBLE)
       |      AS digits,
       |    CAST(len(regexp_extract_all(d.text, '[A-Z]')) AS DOUBLE)
       |      AS uppers,
       |    CAST(len(regexp_extract_all(lower(d.text), '$stopRe'))
       |      AS DOUBLE) AS stop,
       |    CASE WHEN d.text IS NULL THEN NULL ELSE COALESCE(e.ent, 0.0)
       |      END AS ent
       |  FROM documents d LEFT JOIN entc e USING (doc_id)),
       |feats AS (SELECT doc_id, lang,
       |    1.0 AS x0,
       |    round(ln(chars + 1.0), 9) AS x1,
       |    round(ln(toks + 1.0), 9) AS x2,
       |    punct / greatest(chars, 1.0) AS x3,
       |    digits / greatest(chars, 1.0) AS x4,
       |    uppers / greatest(chars, 1.0) AS x5,
       |    ent AS x6,
       |    chars / greatest(toks, 1.0) AS x7,
       |    stop / greatest(toks, 1.0) AS x8,
       |    CASE WHEN itoks >= 60 THEN 1.0
       |         WHEN itoks IS NULL THEN NULL ELSE 0.0 END AS y
       |  FROM base),
       |tf AS (SELECT * FROM feats WHERE y IS NOT NULL)""".stripMargin
  }

  private def cols(f: Int => String, sep: String = ",\n    "): String =
    (0 until D).map(f).mkString(sep)

  /** Stats pass + standardization: one aggregate over `tf`, then the
    * mean/scale arithmetic in the Scala loop's exact order
    * (`m = sΣ/n`, `v = qΣ/n − m·m`, constant features pass through
    * with scale 1).
    */
  private val statCtes: String =
    s"""st AS (SELECT count(*) AS n,
       |    ${cols(i => s"${latticeSum(s"x$i")} AS s$i, " +
                    s"${latticeSum(s"x$i * x$i")} AS q$i")}
       |  FROM tf),
       |msr AS (SELECT CAST(n AS DOUBLE) AS nd,
       |    ${cols(i => s"${decDbl(s"s$i")} / CAST(n AS DOUBLE) AS rm$i")},
       |    ${cols(i => s"${decDbl(s"q$i")} / CAST(n AS DOUBLE) " +
                    s"- (${decDbl(s"s$i")} / CAST(n AS DOUBLE)) " +
                    s"* (${decDbl(s"s$i")} / CAST(n AS DOUBLE)) AS v$i")}
       |  FROM st),
       |ms AS (SELECT nd,
       |    ${cols(i => s"CASE WHEN v$i > 1e-12 THEN rm$i ELSE 0.0 END AS m$i")},
       |    ${cols(i => s"CASE WHEN v$i > 1e-12 THEN sqrt(v$i) ELSE 1.0 END AS sc$i")}
       |  FROM msr),
       |zf AS (SELECT tf.y, ${cols(i => s"(tf.x$i - ms.m$i) / ms.sc$i AS z$i")}
       |  FROM tf CROSS JOIN ms)""".stripMargin

  /** The unrolled GD chain `it0 .. it$Iters`, each iteration one
    * aggregate over `zf`: margin = Σ zᵢwᵢ (ascending left fold),
    * p = table sigmoid, err = p − y, exact lattice gradient sums,
    * `w −= lr · (g/n)`.
    */
  private val iterCtes: String = {
    val init = s"it0 AS (SELECT ${cols(i => s"0.0 AS w$i")} FROM ms)"
    val steps = (1 to Iters).map { k =>
      val margin = (0 until D).map(i => s"z$i * w.w$i").mkString(" + ")
      s"""p$k AS (SELECT y, ${cols(i => s"z$i")},
         |    ${sig(margin)} AS p
         |  FROM zf CROSS JOIN it${k - 1} w CROSS JOIN sig),
         |gr$k AS (SELECT
         |    ${cols(i => s"${latticeSum(s"(p - y) * z$i")} AS g$i")}
         |  FROM p$k),
         |it$k AS (SELECT
         |    ${cols(i => s"w.w$i - $Lr * (${decDbl(s"g$i")} / ms.nd) AS w$i")}
         |  FROM gr$k CROSS JOIN it${k - 1} w CROSS JOIN ms)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }

  /** Fold-back to raw-space weights: `oᵢ = wᵢ/scᵢ`, with the shift
    * `Σ wᵢ·mᵢ/scᵢ` (ascending left fold) landing on the bias.
    */
  private val finCte: String = {
    val shift = (0 until D).map(i => s"w.w$i * ms.m$i / ms.sc$i")
      .mkString(" + ")
    s"""fin AS (SELECT
       |    w.w0 / ms.sc0 - ($shift) AS o0,
       |    ${(1 until D).map(i => s"w.w$i / ms.sc$i AS o$i").mkString(",\n    ")}
       |  FROM it$Iters w CROSS JOIN ms)""".stripMargin
  }

  private val trainChain: String =
    s"$featCtes,\n$statCtes,\n$iterCtes,\n$finCte"

  /** q_quality_model — the learned (idx, feature, weight) frame. */
  def qualityModelSql: String = {
    val vals = FeatureNames.zipWithIndex
      .map { case (n, i) => s"($i, '$n')" }.mkString(", ")
    val pick = (0 until D).map(i => s"WHEN $i THEN o$i").mkString(" ")
    materialized(s"""WITH $trainChain
       |SELECT f.idx, f.feature,
       |  CASE f.idx $pick END AS weight
       |FROM (VALUES $vals) f(idx, feature) CROSS JOIN fin""".stripMargin)
  }

  /** q_quality_scores — sigmoid(w·x) over the RAW features with the
    * learned weights folded in ([[QualityModel.scoreColumn]]); null
    * text scores null on both engines.
    */
  def qualityScoresSql: String = {
    val margin = (0 until D).map(i => s"x$i * fin.o$i").mkString(" + ")
    materialized(s"""WITH $trainChain
       |SELECT feats.doc_id, feats.lang,
       |  ${sig(margin)} AS score
       |FROM feats CROSS JOIN fin CROSS JOIN sig""".stripMargin)
  }

  /** q_calibration — the reliability report over the scored corpus:
    * decile buckets of the replayed sigmoid scores against the
    * training weak label (tokenCount >= 60), observed positive rate
    * in integer basis points. Bucketing is floor(score·10) on the
    * IDENTICAL doubles both engines produce (q_quality_scores is
    * hash-green), clamped to 9.
    */
  def calibrationSql: String =
    s"""WITH s AS MATERIALIZED (FROM ($qualityScoresSql) q),
       |tok AS (SELECT doc_id,
       |  len(regexp_extract_all(text, '\\S+')) >= 60 AS pos
       |  FROM documents)
       |SELECT CAST(least(9, floor(score * 10)) AS INT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_pos,
       |  CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
       |    * 10000 // CAST(count(*) AS BIGINT) AS pos_rate_bp
       |FROM s JOIN tok USING (doc_id)
       |WHERE score IS NOT NULL
       |GROUP BY 1""".stripMargin
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation — nDCG@k, MRR, precision/recall@k per
  * query against binary relevance judgments: the eval harness for the
  * engine's retrieval stack (BM25, dense, hybrid, MMR), and the
  * "did the index change hurt ranking" regression gate an IR system
  * runs on every build.
  *
  * Exactness: DCG terms are pre-quantized to INTEGER micro-units —
  * `unit(r) = round(10¹² / log₂(r+1))` for r = 1..k, a CONSTANT table
  * of the operator computed once and inlined — so per-query DCG and
  * ideal-DCG are exact integer sums (order-free, layout-free), and
  * nDCG is one double division both engines round identically. At
  * k ≤ 1000 the 10⁻¹² quantization error is orders below any rank
  * flip. MRR/precision/recall are single divisions of exact integers.
  *
  * 100 TB shape: the ranking side is per-query top-k (tiny by
  * construction); judgments join on `(qid, doc_id)` — one hash join +
  * one aggregate, both on the query key space. The expensive part of
  * any evaluation is building `qrels`, which is the caller's query
  * (e.g. an all-terms-present containment scan) and shares its cost
  * class with the retrieval being evaluated.
  *
  * Queries with zero relevant documents score ndcg/mrr/recall 0
  * (not NULL, not dropped) — an eval run must surface them, they are
  * usually the interesting failures.
  */
object RankEval {

  /** DCG micro-unit table for ranks 1..k (constants of the metric). */
  def dcgUnits(k: Int): Seq[Long] =
    (1 to k).map(r => math.round(1e12 / (math.log(r + 1.0) / math.log(2.0))))

  /** @param ranking (qid, doc_id, rank) — rank 1-based, one system's
    *                retrieved list
    * @param qrels   (qid, doc_id) — the relevant pairs (binary)
    * @return per qid: n_rel, hits, first_rel_rank (0 when none),
    *         ndcg, mrr, precision, recall — doubles rounded to 6
    */
  def rankingMetrics(
      ranking: DataFrame,
      qrels: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val units = dcgUnits(k)
    val cum = units.scanLeft(0L)(_ + _).tail
    val unitCol = element_at(typedlit(units), col("rank").cast("int"))
    val rel = qrels.select(col("qid"), col("doc_id"), lit(1).as("rel"))
    val perQ = ranking.filter(col("rank") <= k)
      .join(rel, Seq("qid", "doc_id"), "left")
      .groupBy(col("qid"))
      .agg(
        sum(when(col("rel").isNotNull, unitCol).otherwise(0L))
          .as("dcg_units"),
        count(when(col("rel").isNotNull, lit(1))).as("hits"),
        min(when(col("rel").isNotNull, col("rank"))).as("frr"))
    val nRel = qrels.groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    val idcg = when(col("n_rel") >= 1,
      element_at(typedlit(cum),
        least(lit(k), col("n_rel")).cast("int")))
    perQ
      .join(nRel, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("hits"),
        coalesce(col("frr"), lit(0)).cast("int").as("first_rel_rank"),
        round(coalesce(col("dcg_units").cast("double") /
          idcg.cast("double"), lit(0.0)), 6).as("ndcg"),
        round(coalesce(lit(1.0) / col("frr"), lit(0.0)), 6).as("mrr"),
        round(col("hits").cast("double") / lit(k.toDouble), 6)
          .as("precision"),
        round(coalesce(col("hits").cast("double") /
          col("n_rel").cast("double"), lit(0.0)), 6).as("recall"))
  }

  /** The DCG unit table rendered as a SQL VALUES relation
    * `(rank, u)` — for oracle replay; the longs are the SAME
    * constants [[dcgUnits]] inlines into the plan.
    */
  def dcgUnitsSqlValues(k: Int): String =
    dcgUnits(k).zipWithIndex
      .map { case (u, i) => s"(${i + 1}, ${u}::BIGINT)" }
      .mkString(", ")

  /** Binary-classification evaluation: the confusion matrix plus
    * precision / recall / F1 in integer basis points — the
    * classifier-side companion to [[rankingMetrics]] (a quality
    * filter or dedup gate is a CLASSIFIER over the corpus, and its
    * eval must be as exact as the queries it gates).
    *
    * All-integer: counts are one conditional aggregate (map-side
    * partials, four longs through the exchange); F1 comes from the
    * direct formula f1 = 2·tp / (2·tp + fp + fn) — one floor
    * division of exact integers, never the compounding p·r/(p+r)
    * float form. Degenerate denominators (no positive predictions /
    * no positive truths) yield 0, surfaced rather than dropped.
    */
  def confusion(
      df: DataFrame, truthCol: Column, predCol: Column): DataFrame =
    df
      .select(truthCol.as("t"), predCol.as("p"))
      .agg(
        sum(when(col("t") && col("p"), 1L).otherwise(0L)).as("tp"),
        sum(when(!col("t") && col("p"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("t") && !col("p"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("t") && !col("p"), 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        // integral `div`, not float division — tp·10⁴ passes 2^53
        // (exact-double territory) near 1e12 rows
        when(col("tp") + col("fp") > 0,
          expr("tp * 10000 div (tp + fp)"))
          .otherwise(lit(0L)).as("precision_bp"),
        when(col("tp") + col("fn") > 0,
          expr("tp * 10000 div (tp + fn)"))
          .otherwise(lit(0L)).as("recall_bp"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          expr("2 * tp * 10000 div (2 * tp + fp + fn)"))
          .otherwise(lit(0L)).as("f1_bp"))
}

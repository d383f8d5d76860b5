package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion across retrieval systems — the hybrid-search join of a
  * RAG stack: lexical (BM25) and dense (ANN) retrievers each produce
  * a per-query ranking, and Reciprocal Rank Fusion (Cormack, Clarke &
  * Büttcher, SIGIR'09) combines them on RANKS alone:
  * `score(d) = Σ_systems 1 / (k + rank_s(d))`, conventionally k=60.
  * Fusing ranks rather than scores is the point — BM25 log-weights
  * and cosine similarities are not commensurable, ranks always are.
  *
  * Engine-exactness: each reciprocal contribution is snapped to the
  * 9-dp lattice (one correctly-rounded IEEE division + one decimal
  * round — identical on any engine) and summed as exact DECIMAL, so
  * the fused ordering and the emitted score are layout- and
  * engine-independent; q_hybrid_search is hash-checked against a
  * DuckDB replay of both input rankings AND the fusion.
  *
  * Scale: the inputs are top-k rankings — ≤ k rows per query per
  * system by contract — so fusion costs one union + one (qid, id)
  * aggregation over k·|systems| rows per query and a bounded-heap
  * top-k ([[TopK.topKPerGroup]]: ≤ topK-row state per query through
  * the exchange). The expensive work lives in the upstream
  * retrievers, which carry their own scale paths (bucketed postings
  * for BM25, IVF/LSH for dense).
  */
object Fusion {

  /** Fuse per-query rankings by RRF.
    *
    * @param rankings one DataFrame per retrieval system, each with
    *                 columns (`qidCol`, `idCol`, `rankCol`) — ranks
    *                 1-based, ≤ some per-system top-k
    * @param rrfK     the RRF damping constant (60 in the paper)
    * @param topK     fused results kept per query
    * @return (qid, rank, id, rrf_score, n_systems): `rank` 1-based by
    *         (exact fused score desc, id asc); `n_systems` = how many
    *         input rankings contained the id
    */
  def reciprocalRankFusion(
      rankings: Seq[DataFrame],
      qidCol: String, idCol: String, rankCol: String,
      rrfK: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(rrfK >= 0, s"rrfK must be >= 0, got $rrfK")
    require(topK > 0, s"topK must be positive, got $topK")
    val contribs = rankings.map(_.select(
      col(qidCol).as("qid"), col(idCol).as("id"),
      // one IEEE division (both engines correctly round it) snapped
      // to the 9-dp lattice, then EXACT decimal accumulation — the
      // round-then-cast discipline, so fold order cannot leak
      round(lit(1.0) / (lit(rrfK.toDouble) + col(rankCol).cast("double")), 9)
        .cast("decimal(18,9)").as("c")))
    val fused = contribs.reduce(_.unionAll(_))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("c")).cast("decimal(18,9)").as("s"),
        count(lit(1)).as("n_systems"))
      // the EMITTED score is the 9-dp-rounded double (a raw DECIMAL
      // output column is the r8 reader-asymmetry red class); ranking
      // below stays on the exact decimal
      .withColumn("rrf_score", round(col("s").cast("double"), 9))
    TopK.topKPerGroup(
        fused.withColumn("neg_id", -col("id")),
        Seq("qid"),
        struct(col("s"), col("neg_id"), col("id"), col("rrf_score"),
          col("n_systems")),
        topK, largest = true)
      .select(col("qid"), col("rank"), col("id"), col("rrf_score"),
        col("n_systems"))
  }
}

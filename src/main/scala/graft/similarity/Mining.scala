package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hard-negative mining for contrastive training — for each query,
  * the nearest corpus vectors that are NOT among its positives: the
  * highest-similarity wrong answers, which is exactly what a
  * contrastive loss needs on the negative side (random negatives are
  * trivially separable; the nearest non-positives carry the
  * gradient).
  *
  * Two entry points, one ranking rule:
  *  - [[hardNegatives]] scores the full corpus (the brute-force
  *    verification twin — same cosine/4-dp/tie-break discipline as
  *    [[Knn.bruteForceKnn]]) and excludes positives BEFORE ranking,
  *    so the top-k negatives are exact: an exclude-after-top-k would
  *    under-fill whenever positives crowd the head of the ranking.
  *  - [[hardNegativesFrom]] ranks any precomputed candidate set —
  *    the scale path: feed it [[Ivf.ivfKnn]] (probe-pruned) or LSH
  *    candidates with a generous k and the anti-join + re-rank stays
  *    one bounded window per query.
  */
object Mining {

  /** Exact hard negatives: (query_id, rank, vec_id, score), the k
    * most-cosine-similar corpus vectors per query excluding the
    * query itself and its `positives` (query_id, vec_id) pairs.
    */
  def hardNegatives(
      queries: DataFrame,   // (query_id, vector)
      corpus: DataFrame,    // (vec_id, vector)
      positives: DataFrame, // (query_id, vec_id) to exclude
      k: Int): DataFrame = {
    require(k > 0, s"top-k needs k > 0, got $k")
    import Knn.{dot, norm}
    val q = broadcast(queries.select(
      col("query_id"), col("vector").cast("array<double>").as("qv"))
      .withColumn("qn", norm(col("qv")))
      .filter(col("qn") > 0))
    val c = corpus.select(
      col("vec_id"), col("vector").cast("array<double>").as("cv"))
      .withColumn("cn", norm(col("cv")))
      .filter(col("cn") > 0)
    val scored = c.join(q, col("vec_id") =!= col("query_id"))
      .join(positives.select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), "left_anti")
      .withColumn("score",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    rank(scored, k)
  }

  /** Rank precomputed candidates (query_id, vec_id, score) after
    * excluding positives — composes with any ANN candidate
    * generator; exact relative to the candidates it is given.
    */
  def hardNegativesFrom(
      candidates: DataFrame,
      positives: DataFrame,
      k: Int): DataFrame = {
    require(k > 0, s"top-k needs k > 0, got $k")
    rank(candidates
      .select(col("query_id"), col("vec_id"), col("score"))
      .join(positives.select(col("query_id"), col("vec_id")),
        Seq("query_id", "vec_id"), "left_anti"), k)
  }

  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "score")
  }
}

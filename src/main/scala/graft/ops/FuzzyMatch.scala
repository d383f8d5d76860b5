package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution): find record pairs whose
  * text differs by at most `maxDist` edits WITHOUT the all-pairs
  * cartesian.
  *
  * Blocking is the standard scale move: records only meet inside a
  * block (here: the text's first `prefixLen` characters), so the join
  * is an EQUI-join on the block key — candidate volume is the sum of
  * per-block squares, not |df|². The Levenshtein evaluation then runs
  * only on candidates, after a free length-band prune (edit distance
  * is bounded below by the length difference, so the band filter can
  * never change results — it only skips guaranteed-fail comparisons).
  *
  * Prefix blocking misses pairs whose edits fall in the first
  * `prefixLen` characters — the classic recall/cost dial. For higher
  * recall, union candidates from a second pass blocked on a suffix or
  * a sorted-neighborhood key; precision is always exact (the distance
  * predicate is evaluated on the full strings).
  *
  * A hot block (many records sharing a prefix) concentrates its
  * candidate pairs on one reducer; guard with a block-size cap or
  * salt, same pattern as the Dedup pipelines' skew guards.
  */
object FuzzyMatch {

  /** @param suffixProbe add a second candidate pass blocked on the
    *        LAST `prefixLen` characters and union the results —
    *        catches pairs whose edits fall inside the prefix (they
    *        must then agree on the suffix, unless the string is
    *        shorter than prefixLen + maxDist). Doubles candidate cost
    *        for roughly "either-end edit" recall.
    */
  def blockedLevenshteinPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      prefixLen: Int = 2,
      maxDist: Int = 3,
      suffixProbe: Boolean = false): DataFrame = {
    require(prefixLen > 0, s"prefixLen must be positive, got $prefixLen")
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    // thresholded levenshtein: O(maxDist * len) with early exit,
    // returning -1 past the threshold — cheaper than the full O(n*m)
    // matrix on the (majority) non-matching candidates
    val d = levenshtein(col("txt_a"), col("txt_b"), maxDist)
    def pairsOn(blk: Column): DataFrame = {
      def side(tag: String): DataFrame = df.select(
        col(idCol).as(s"id_$tag"),
        col(textCol).as(s"txt_$tag"),
        blk.as("_blk"))
      side("a").join(side("b"), "_blk")
        .filter(col("id_a") < col("id_b"))
        .filter(abs(length(col("txt_a")) - length(col("txt_b"))) <= maxDist)
        .filter(d >= 0)
        .select(col("id_a"), col("id_b"), d.as("dist"))
    }
    val pre = pairsOn(substring(col(textCol), 1, prefixLen))
    if (!suffixProbe) pre
    else pre.unionByName(
        pairsOn(substring(col(textCol), -prefixLen, prefixLen)))
      .dropDuplicates("id_a", "id_b")
  }
}

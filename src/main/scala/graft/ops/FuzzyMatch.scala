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
  * Hot blocks (many records sharing a prefix — "the ", "a n" — think
  * celebrity keys at corpus scale) would concentrate their quadratic
  * candidate volume on ONE reducer. The guard here is recall-free:
  * blocks above `maxBlock` are detected with ONE `groupBy.count`
  * collected to the driver (bounded by |df|/maxBlock keys, so
  * scalar-sized by construction — same pattern as Dedup's LSH bucket
  * guard) and routed via isin literals to a TRIANGLE-SALTED self-join
  * — each hot-block record is hashed into one of `salts` groups and
  * replicated to the (salts+1) cells of the upper-triangular group
  * grid, so every unordered pair still meets in exactly one cell but
  * per-reducer pair volume falls from n² to (n/salts)². Unlike a
  * drop-cap, no pair is lost; unlike blanket salting, cold blocks pay
  * nothing beyond the map-side-combined count.
  */
object FuzzyMatch {

  /** @param suffixProbe add a second candidate pass blocked on the
    *        LAST `prefixLen` characters and union the results —
    *        catches pairs whose edits fall inside the prefix (they
    *        must then agree on the suffix, unless the string is
    *        shorter than prefixLen + maxDist). Doubles candidate cost
    *        for roughly "either-end edit" recall.
    * @param maxBlock blocks with more rows than this are routed to the
    *        triangle-salted path (identical results, bounded reducer
    *        load). The default keeps per-reducer candidates ≤ ~25M
    *        comparisons; tune down for wide rows.
    * @param salts group count for the triangle path: per-reducer pair
    *        volume shrinks by salts², replication cost is (salts+1)×
    *        per hot-block row.
    */
  def blockedLevenshteinPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      prefixLen: Int = 2,
      maxDist: Int = 3,
      suffixProbe: Boolean = false,
      maxBlock: Int = 5000,
      salts: Int = 16): DataFrame = {
    require(prefixLen > 0, s"prefixLen must be positive, got $prefixLen")
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(maxBlock > 0, s"maxBlock must be positive, got $maxBlock")
    require(salts > 1, s"salts must be > 1, got $salts")
    // thresholded levenshtein: O(maxDist * len) with early exit,
    // returning -1 past the threshold — cheaper than the full O(n*m)
    // matrix on the (majority) non-matching candidates
    val d = levenshtein(col("txt_a"), col("txt_b"), maxDist)
    val lenBand =
      abs(length(col("txt_a")) - length(col("txt_b"))) <= maxDist

    def pairsOn(blk: Column): DataFrame = {
      def side(tag: String): DataFrame = df.select(
        col(idCol).as(s"id_$tag"),
        col(textCol).as(s"txt_$tag"),
        blk.as("_blk"))
      val tagged = side("a")
      // hot-key detection: ONE map-side-combined count, collected to
      // the driver — the result is bounded by |df| / maxBlock keys
      // (each needs > maxBlock rows), so it is scalar-sized by
      // construction. Driver literals beat re-evaluating the groupBy
      // subtree under each of the three joins that referenced it
      // (Spark has no automatic subtree reuse across joins), and the
      // isin filters evaluate scan-side with zero extra shuffles.
      val hotKeys: Array[Any] = tagged.groupBy(col("_blk")).count()
        .filter(col("count") > maxBlock)
        .select(col("_blk")).collect().map(_.get(0))
      // rows with a NULL block key can never meet anything in an
      // equi-join, so excluding them from both paths (isin is NULL on
      // NULL input) does not change the pair output
      def cold(t: DataFrame): DataFrame =
        if (hotKeys.isEmpty) t else t.filter(!col("_blk").isin(hotKeys: _*))
      val coldPairs = cold(tagged)
        .join(cold(side("b")), "_blk")
        .filter(col("id_a") < col("id_b"))
        .filter(lenBand)
        .filter(d >= 0)
        .select(col("id_a"), col("id_b"), d.as("dist"))
      if (hotKeys.isEmpty) coldPairs else saltedUnion(coldPairs, tagged, hotKeys)
    }

    def saltedUnion(
        coldPairs: DataFrame, tagged: DataFrame,
        hotKeys: Array[Any]): DataFrame = {
      // triangle-salted path for hot blocks: record → group g =
      // hash(id) mod salts; left role occupies cells (g, j), j ≥ g;
      // right role occupies cells (i, g), i ≤ g. Every unordered
      // cross-group pair meets in exactly one cell (min, max); same-
      // group pairs meet twice in the diagonal cell with both
      // orderings, which the id_a < id_b filter collapses to one.
      val hotRows = tagged.filter(col("_blk").isin(hotKeys: _*))
        .withColumn("_g",
          pmod(xxhash64(col("id_a")), lit(salts.toLong)).cast("int"))
      val left = hotRows.select(
        col("id_a"), col("txt_a"), col("_blk"), col("_g").as("_glo"),
        explode(sequence(col("_g"), lit(salts - 1))).as("_ghi"))
      val right = hotRows.select(
        col("id_a").as("id_b"), col("txt_a").as("txt_b"), col("_blk"),
        explode(sequence(lit(0), col("_g"))).as("_glo"),
        col("_g").as("_ghi"))
      val hotPairs = left.join(right, Seq("_blk", "_glo", "_ghi"))
        .filter(col("_glo") < col("_ghi") || col("id_a") < col("id_b"))
        .filter(lenBand)
        .filter(d >= 0)
        .select(
          least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"),
          d.as("dist"))
      coldPairs.unionByName(hotPairs)
    }
    val pre = pairsOn(substring(col(textCol), 1, prefixLen))
    if (!suffixProbe) pre
    else pre.unionByName(
        pairsOn(substring(col(textCol), -prefixLen, prefixLen)))
      .dropDuplicates("id_a", "id_b")
  }
}

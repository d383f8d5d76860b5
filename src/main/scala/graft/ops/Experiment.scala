package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experimentation analytics: the two-proportion z-test over a pair
  * of variants — "is B's conversion rate actually different from
  * A's, or is this noise" — computed from exact per-unit conversion
  * counts.
  *
  * Unit-level first: conversion is per UNIT (user), not per event —
  * a user who purchased five times converts once — so the counting
  * pass is one unit-keyed aggregate followed by one 2-row variant
  * aggregate. The z statistic uses the pooled-proportion standard
  * error (the classic A/B formulation):
  *
  * {{{ z = (p_a − p_b) / sqrt( p̂(1−p̂) · (1/n_a + 1/n_b) ) }}}
  *
  * Determinism: counts are exact longs; the rates and z are a FIXED
  * sequence of individually correctly-rounded IEEE operations
  * (divisions, one sqrt — sqrt is an exact-rounded IEEE op), written
  * in the same order as the oracle SQL, with z rounded to 9 dp (the
  * engine-portability discipline). `significant` compares the
  * ROUNDED z against the threshold, so the flag cannot straddle
  * engines.
  *
  * Scale: one key shuffle on the unit column + a 2-row aggregate;
  * the statistics finish driver-side from the two bounded rows.
  */
object Experiment {

  /** Emits ONE row:
    * `(variant_a, variant_b, n_a, conv_a, n_b, conv_b, p_a, p_b, z,
    * significant)` — variants named by their (string-cast) values in
    * ascending order. Exactly two variants must be present.
    *
    * @param converted per-EVENT predicate; a unit converts if ANY of
    *                  its rows satisfies it
    * @param zAlert    two-sided threshold on |z| (default 1.96, the
    *                  5% level)
    */
  def abTest(
      events: DataFrame,
      variantCol: Column,
      unitCol: Column,
      converted: Column,
      zAlert: Double = 1.96): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val perUnit = events
      .select(variantCol.cast("string").as("__v"), unitCol.as("__u"),
        converted.as("__c"))
      .groupBy(col("__v"), col("__u"))
      .agg(max(when(coalesce(col("__c"), lit(false)), 1L)
        .otherwise(0L)).as("__conv"))
    val rows = perUnit.groupBy(col("__v"))
      .agg(count(lit(1)).as("n"), sum(col("__conv")).as("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(rows.length == 2,
      s"abTest needs exactly 2 variants, got ${rows.map(_._1).mkString(", ")}")
    val (va, na, ka) = rows(0)
    val (vb, nb, kb) = rows(1)
    require(na > 0 && nb > 0, "each variant needs at least one unit")
    // the EXACT operation sequence of the oracle SQL — do not
    // re-associate (each step is correctly rounded; the sequence is
    // the contract)
    val pa = ka.toDouble / na.toDouble
    val pb = kb.toDouble / nb.toDouble
    val pp = (ka + kb).toDouble / (na + nb).toDouble
    // equal rates ⇒ z := 0 BEFORE the division: it also covers the
    // degenerate pooled rates 0 and 1 (everyone/no one converts),
    // where the standard error is 0 and the quotient would be 0/0 —
    // with pa ≠ pb, pp is strictly inside (0,1) and the s.e. positive
    val z9 =
      if (pa == pb) 0.0
      else {
        val z = (pa - pb) / math.sqrt(
          pp * (1.0 - pp) * (1.0 / na.toDouble + 1.0 / nb.toDouble))
        java.math.BigDecimal.valueOf(z)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
      }
    Seq((va, vb, na, ka, nb, kb, pa, pb, z9, math.abs(z9) > zAlert))
      .toDF("variant_a", "variant_b", "n_a", "conv_a", "n_b", "conv_b",
        "p_a", "p_b", "z", "significant")
  }

  /** Pearson chi-square test of independence over a two-way
    * contingency table — "does the row attribute's distribution
    * differ across the column attribute" (segment × priority,
    * variant × outcome-class, source × language). Emits ONE row:
    * `(chi2_micro, dof, n)`.
    *
    * Exact integer 6-dp lattice (the lm_score discipline), so the
    * statistic is layout- and engine-exact with no float summation
    * order to disagree on: per cell, E_micro = ⌊r·c·10⁶ / n⌋,
    * d_micro = o·10⁶ − E_micro, contrib = ⌊d_micro² / E_micro⌋
    * (χ²·10⁶ up to the lattice floor). The full k×m grid is
    * generated from the margins — cells with O = 0 contribute their
    * expected mass like the textbook statistic; an expected count
    * flooring to zero clamps to 1 micro-unit (degenerate-cell guard,
    * documented rather than silent). Budget: d_micro² accumulates in
    * DECIMAL(38,0) — o·10⁶ is ~1e18 at 1e12 observations, its square
    * ~1e36, inside decimal(38), catastrophically outside long.
    *
    * Scale: one hash agg over fact rows → ≤ k·m cells; margins,
    * grid and the final sum are all bounded-table work.
    */
  def chiSquare(
      df: DataFrame, rowCol: Column, colCol: Column): DataFrame = {
    val Dec = "decimal(38,0)"
    val ct = df.select(rowCol.as("r"), colCol.as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("o"))
      .localCheckpoint() // ≤ k·m cells; margins + grid both read it
    val rm = ct.groupBy(col("r")).agg(sum(col("o")).as("rn"))
    val cm = ct.groupBy(col("c")).agg(sum(col("o")).as("cn"))
    val nn = ct.agg(sum(col("o")).as("n"),
      count_distinct(col("r")).as("k"),
      count_distinct(col("c")).as("m"))
    broadcast(rm).crossJoin(broadcast(cm))
      .join(ct, Seq("r", "c"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(nn))
      .withColumn("emicro",
        greatest(lit(1L),
          expr(s"CAST(rn AS $Dec) * cn * 1000000 div n")))
      .withColumn("dmicro", col("o") * lit(1000000L) - col("emicro"))
      .withColumn("contrib",
        expr(s"CAST(dmicro AS $Dec) * dmicro div emicro"))
      .groupBy(col("n"), col("k"), col("m"))
      // per-cell contrib is a long, but the SUM accumulates in
      // decimal(38,0): Σ contrib is bounded by n·10⁶·(min(k,m)−1),
      // which clears Long.Max (9.2e18) already at n = 1e12, k = 10⁴.
      // One cast back to long at the end — out of range goes NULL
      // (visible), never a silent two's-complement wrap
      .agg(sum(col("contrib").cast(Dec)).cast("long").as("chi2_micro"))
      .select(col("chi2_micro"),
        ((col("k") - 1) * (col("m") - 1)).as("dof"), col("n"))
  }

  /** Mutual information between two categorical columns, in nats —
    * the effect-size companion to [[chiSquare]] (χ² says "dependent",
    * MI says "by how many bits"): I = Σ_ij (o/n)·ln(o·n / (r·c)),
    * observed cells only (0·ln 0 = 0, the standard convention).
    *
    * Determinism is the lm_score 9-dp lattice discipline
    * (text/LangModel.scala): each cell's log is `round(ln(x), 9)`
    * with x produced by a FIXED sequence of correctly-rounded IEEE
    * ops ((o·n as double) / (r·c as double) — longs cast BEFORE
    * multiplying; o·n overflows a long at 1e12 rows), each term
    * o·L is then EXACT on the 9-dp lattice, the sum accumulates in
    * DECIMAL(38,9), and mi_nano = HALF_UP(|S9|/n) in pure long
    * arithmetic — no decimal→double cast, no float round. Emits ONE
    * row `(mi_nano, n)`; callers divide by 1e9.
    *
    * Scale: identical to chiSquare — one fact-scale hash agg, then
    * ≤ k·m bounded-cell arithmetic.
    */
  def mutualInformation(
      df: DataFrame, rowCol: Column, colCol: Column): DataFrame = {
    val ct = df.select(rowCol.as("r"), colCol.as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("o"))
      .localCheckpoint() // ≤ k·m cells; margins read it twice
    val rm = ct.groupBy(col("r")).agg(sum(col("o")).as("rn"))
    val cm = ct.groupBy(col("c")).agg(sum(col("o")).as("cn"))
    val nn = ct.agg(sum(col("o")).as("n"))
    ct.join(broadcast(rm), Seq("r"))
      .join(broadcast(cm), Seq("c"))
      .crossJoin(broadcast(nn))
      // per-cell 9-dp log, carried as INTEGER nano-units (|ln| ≤
      // ln(n) ≈ 28 at 1e12 rows → |l9| ≤ 2.8e10, exact in long);
      // the (20,9)·1e9 product is integral by construction, so the
      // long cast truncates nothing
      .withColumn("l9",
        (round(log((col("o").cast("double") * col("n").cast("double")) /
            (col("rn").cast("double") * col("cn").cast("double"))), 9)
          .cast("decimal(20,9)") * lit(1000000000L)).cast("long"))
      // Σ o·l9 in narrow exact decimals — (18,0)·(12,0) → (31,0),
      // never the >38-precision product Spark would silently re-scale
      .groupBy(col("n"))
      .agg(sum(col("o").cast("decimal(18,0)") *
        col("l9").cast("decimal(12,0)")).as("s9"))
      .select(
        (when(col("s9") < 0, lit(-1L)).otherwise(lit(1L)) *
          expr("(2 * abs(s9) + n) div (2 * n)")).as("mi_nano"),
        col("n"))
  }
}

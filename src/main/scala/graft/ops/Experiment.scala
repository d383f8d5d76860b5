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
}

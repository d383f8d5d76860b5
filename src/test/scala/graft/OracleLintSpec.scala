package graft

import org.apache.spark.sql.functions._

/** The hash-stability lint pinned both ways: it must flag exactly the
  * two round-7 failure shapes (array output cells; unrounded
  * high-scale DECIMAL→DOUBLE casts) on deliberately-broken queries,
  * must accept their repaired forms, and must pass every
  * oracle-checked query on the board (the property Verify enforces at
  * dump time).
  */
class OracleLintSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq((1L, 2.5), (2L, 3.5)).toDF("id", "x")

  test("an unrounded high-scale decimal→double cast is flagged") {
    val bad = docs
      .select(col("id"), col("x").cast("decimal(28,12)").as("d"))
      .groupBy(col("id")).agg(sum(col("d")).as("s"))
      .select(col("id"), col("s").cast("double").as("score"))
    val errs = OracleLint.check("deliberately_unrounded", bad)
    assert(errs.exists(_.contains("DECIMAL(38,12)")),
      s"lint missed the unrounded cast: $errs")
    intercept[IllegalStateException] {
      OracleLint.enforce("deliberately_unrounded", bad)
    }
  }

  test("the same cast under round(..., 9) passes") {
    val good = docs
      .select(col("id"), col("x").cast("decimal(28,12)").as("d"))
      .groupBy(col("id")).agg(sum(col("d")).as("s"))
      .select(col("id"), round(col("s").cast("double"), 9).as("score"))
    assert(OracleLint.check("rounded", good).isEmpty)
    // rounding ABOVE further arithmetic on the cast also counts — the
    // lm_score shape round(cast(dec)/n, 9)
    val quotient = docs
      .select(col("id"), col("x").cast("decimal(28,12)").as("d"))
      .select(col("id"),
        round(col("d").cast("double") / col("id"), 9).as("score"))
    assert(OracleLint.check("rounded_quotient", quotient).isEmpty)
  }

  test("low-scale (money) decimal→double casts pass unrounded") {
    val money = docs
      .select(col("id"), col("x").cast("decimal(18,2)").as("d"))
      .select(col("id"), col("d").cast("double").as("v"))
    assert(OracleLint.check("money", money).isEmpty)
  }

  test("ANY decimal output column is flagged (rule 3, the r8 class)") {
    // value-identical results still hash-mismatch when one reader
    // renders DECIMAL as decimal.Decimal and the other as float64 —
    // low scale does NOT save an output column (q_bm25_search's
    // DECIMAL(18,6) was driver-red)
    val bad = docs.select(col("id"), col("x").cast("decimal(18,6)").as("score"))
    val errs = OracleLint.check("deliberately_decimal_out", bad)
    assert(errs.exists(e => e.contains("'score'") && e.contains("decimal")),
      s"lint missed the decimal output: $errs")
    // the finished form passes
    val good = docs.select(col("id"),
      round(col("x").cast("decimal(18,6)").cast("double"), 6).as("score"))
    assert(OracleLint.check("finished_decimal", good).isEmpty)
  }

  test("an array-typed output column is flagged") {
    val bad = docs.select(col("id"), array(col("x"), col("x")).as("v"))
    val errs = OracleLint.check("deliberately_array", bad)
    assert(errs.exists(_.contains("'v'")), s"lint missed the array: $errs")
    // long form of the same data passes
    val good = docs.select(col("id"),
      posexplode(array(col("x"), col("x"))).as(Seq("j", "v")))
    assert(OracleLint.check("long_form", good).isEmpty)
  }

  test("every oracle-checked query on the board passes the lint") {
    // static: builds each plan (model-fitting queries run their
    // bounded fits) but never executes the result
    val bad = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      OracleLint.check(name, SparkEntry.queries(name)(spark, sfDir))
    }
    assert(bad.isEmpty, s"lint violations on the board:\n${bad.mkString("\n")}")
    spark.catalog.clearCache()
  }
}

package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, RoundBase}
import org.apache.spark.sql.types._

/** Static lint for the two output shapes that cannot survive the
  * driver's exact-hash oracle compare — run by [[Verify]] against
  * every oracle-checked query before its dump, so the failure mode is
  * a loud build-side error instead of a silent driver-red row. Both
  * rules are the round-7 postmortem, mechanized:
  *
  *  1. NO ARRAY/MAP/STRUCT OUTPUT COLUMNS. The comparison harness
  *     row-sorts with pandas, which cannot factorize an ndarray cell
  *     (`TypeError: unhashable type` — the q_pca_project crash).
  *     Array-valued results must be emitted long-form
  *     `(id, index, value)`.
  *
  *  2. NO UNROUNDED HIGH-SCALE DECIMAL→DOUBLE CASTS anywhere in the
  *     plan. The JVM's `BigDecimal.doubleValue` is correctly rounded;
  *     an engine that instead divides the unscaled integer by 10^scale
  *     in floating point is NOT once the unscaled magnitude nears 2^53
  *     — which a scale-12 sum of a few thousand already reaches (the
  *     q_lm_score/q_dsir_* hash mismatches). Such a cast is only
  *     hash-stable if a `round(..., ≤9)` sits above it to snap both
  *     expansions to the same double. Low-scale decimals (≤ 6 — the
  *     money/metric columns) stay far inside 2^53 at any realistic
  *     magnitude, where every engine's conversion is a single
  *     correctly-rounded division, so they pass unrounded.
  *
  *  3. NO DECIMAL OUTPUT COLUMNS AT ALL (the round-8 postmortem,
  *     mechanized). The harness reads the two sides through DIFFERENT
  *     parquet readers: the Spark result via pyarrow/pandas, where a
  *     DECIMAL column becomes Python `decimal.Decimal` objects, and
  *     the oracle via duckdb→pandas, where DECIMAL becomes float64 —
  *     so a DECIMAL output can never hash-match even when the values
  *     are bit-identical (all five r8 float-family reds were exactly
  *     the oracle-checked queries emitting a DECIMAL column; every
  *     green query emitted only BIGINT/INT/DOUBLE/VARCHAR). DECIMAL
  *     stays the right ACCUMULATOR type (order-independent exact
  *     sums); the certified surface must finish it as a rounded
  *     double (`round(cast(c as double), scale)`) — or an integral —
  *     on BOTH sides. (The mirror-image oracle-side failure, a bare
  *     `sum()` going HUGEINT→float64, is invisible to a Scala lint;
  *     `scripts/local_verify.py` reproduces the driver's two readers
  *     and catches it.)
  */
object OracleLint {

  private def scalar(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _                                         => true
  }

  /** The decimal scale above which a bare →double cast is treated as
    * hash-unstable (see class doc).
    */
  val MaxUnroundedScale = 6

  private def walk(
      e: Expression, underRound: Boolean, name: String,
      bad: ArrayBuffer[String]): Unit = e match {
    case r: RoundBase =>
      r.children.foreach(walk(_, underRound = true, name, bad))
    case c: Cast if c.dataType == DoubleType =>
      c.child.dataType match {
        case d: DecimalType if d.scale > MaxUnroundedScale && !underRound =>
          bad += s"$name: DECIMAL(${d.precision},${d.scale})→DOUBLE cast " +
            "with no round(...) above it — not cross-engine hash-stable " +
            "(round the result to ≤ 9 dp on both the query and oracle " +
            "side, or emit the DECIMAL itself)"
        case _ => ()
      }
      c.children.foreach(walk(_, underRound, name, bad))
    case _ =>
      e.children.foreach(walk(_, underRound, name, bad))
  }

  /** All violations for one oracle-checked query; empty = clean.
    * Static — inspects schema and the analyzed plan, never executes.
    */
  def check(name: String, df: DataFrame): Seq[String] = {
    val bad = ArrayBuffer.empty[String]
    df.schema.fields.foreach { f =>
      if (!scalar(f.dataType))
        bad += s"$name: output column '${f.name}' is " +
          s"${f.dataType.simpleString} — the oracle harness cannot " +
          "sort/hash non-scalar cells (emit long form (id, index, value))"
      f.dataType match {
        case d: DecimalType =>
          bad += s"$name: output column '${f.name}' is " +
            s"${d.simpleString} — the harness's two parquet readers " +
            "render DECIMAL as decimal.Decimal vs float64, so it can " +
            "never hash-match even when bit-exact; finish it as " +
            "round(cast(double), scale) (or an integral) on both sides"
        case _ => ()
      }
    }
    df.queryExecution.analyzed.foreach { node =>
      node.expressions.foreach(walk(_, underRound = false, name, bad))
    }
    bad.toSeq
  }

  /** Throwing form used by [[Verify]]: a violation aborts the query's
    * dump with the full finding list.
    */
  def enforce(name: String, df: DataFrame): DataFrame = {
    val errs = check(name, df)
    if (errs.nonEmpty)
      throw new IllegalStateException(
        s"hash-stability lint failed:\n  ${errs.mkString("\n  ")}")
    df
  }
}

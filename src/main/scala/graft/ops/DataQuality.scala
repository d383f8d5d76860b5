package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling — the inspection pass a pipeline runs before
  * trusting a new data drop.
  *
  * `nullProfile` computes, in ONE pass over the input, per-column null
  * counts and exact distinct cardinalities plus the row total, emitted
  * in long format (one row per column) so downstream checks can join
  * against expectation tables. Multiple exact count-distincts compile
  * to a single Expand + aggregate (one shuffle); for very wide or very
  * hot tables swap `countDistinct` for `approx_count_distinct` — the
  * sketch form is mergeable and constant-memory (see
  * q_sketch_accuracy for the asserted error-bound pattern).
  *
  * All emitted metrics are longs, so the profile is deterministic on
  * any layout and engine — min/max/mean profiling is deliberately NOT
  * here: cross-type casts and FP means are where cross-engine
  * comparisons rot.
  */
object DataQuality {

  /** One failed expectation: name, number of violating rows. */
  final case class Violation(name: String, violations: Long)

  /** Raised by [[gate]]; carries every breached expectation. */
  final class ExpectationsFailed(val failed: Seq[Violation])
    extends IllegalStateException(
      failed.map(v => s"${v.name}: ${v.violations} violating rows")
        .mkString("expectations failed — ", "; ", ""))

  /** Expectation gate: every (name, rowPredicate) must hold on all
    * but `maxViolations` rows or the load is rejected with an
    * [[ExpectationsFailed]] listing each breach. A NULL predicate
    * result counts as a violation (unknown is not a pass).
    *
    * All expectations are counted in ONE aggregation pass. This runs
    * its own job; to gate with zero extra passes, ride the same
    * counters on the real action via `observe()` (ObservationSpec
    * shows the pattern) and compare after.
    */
  def gate(
      df: DataFrame,
      expectations: Seq[(String, org.apache.spark.sql.Column)],
      maxViolations: Long = 0L): DataFrame = {
    require(expectations.nonEmpty, "no expectations given")
    val counts = df.agg(
      sum(when(coalesce(expectations.head._2, lit(false)), 0L)
        .otherwise(1L)).as("c0"),
      expectations.tail.zipWithIndex.map { case ((_, cond), i) =>
        sum(when(coalesce(cond, lit(false)), 0L).otherwise(1L))
          .as(s"c${i + 1}")
      }: _*).head()
    val failed = expectations.zipWithIndex.collect {
      case ((name, _), i)
        if Option(counts.getAs[java.lang.Long](i)).exists(_ > maxViolations) =>
          Violation(name, counts.getLong(i))
    }
    if (failed.nonEmpty) throw new ExpectationsFailed(failed)
    df
  }

  /** Quarantine routing — the non-fatal sibling of [[gate]]: instead
    * of rejecting the whole load when expectations are breached, ROUTE
    * each failing row to a quarantine output (tagged with the first
    * rule it failed, in rule order — a scalar tag, so the quarantine
    * table stays flat and joinable) and pass the clean remainder
    * through. The standard shape for 100 TB ingest, where "3 bad rows
    * out of 10¹¹ abort the load" (gate) is usually the wrong policy
    * but silently dropping them is worse.
    *
    * A NULL predicate result fails the rule (unknown is not a pass).
    * Both outputs are single-pass map-side filters over the same scan
    * — no shuffle, no second job; write both in one lineage (e.g.
    * `foreachBatch` to two TableStore tables) and the source is still
    * read once.
    */
  def quarantine(
      df: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)])
      : (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "no rules given")
    val firstFailed = coalesce(
      rules.map { case (name, cond) =>
        when(!coalesce(cond, lit(false)), lit(name))
      }: _*)
    val tagged = df.withColumn("failed_rule", firstFailed)
    (tagged.filter(col("failed_rule").isNull).drop("failed_rule"),
      tagged.filter(col("failed_rule").isNotNull))
  }

  def nullProfile(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    // backtick-quote source names so dots profile as literal column
    // names, not struct paths; generated intermediate names are
    // positional so they never need quoting
    def src(c: String) = df.col("`" + c.replace("`", "``") + "`")
    val aggs =
      count(lit(1)).as("n_rows") +:
        cols.zipWithIndex.flatMap { case (c, i) => Seq(
          sum(when(src(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$i"),
          countDistinct(src(c)).as(s"_nd_$i")) }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cols.zipWithIndex.map { case (c, i) => struct(
      lit(c).as("column"),
      col(s"_nulls_$i").as("n_nulls"),
      col(s"_nd_$i").as("n_distinct")) }: _*)
    wide.select(col("n_rows"), explode(entries).as("e"))
      .select(col("e.column").as("column"), col("n_rows"),
        col("e.n_nulls").as("n_nulls"),
        col("e.n_distinct").as("n_distinct"))
  }

  /** Referential-integrity audit between a referencing table and a
    * referenced table on one key: orphan counts on both sides, match
    * volume, and duplicate-key counts — the FK-health dashboard row.
    *
    * Scale: each side pre-aggregates to one (key, count) row before
    * the join (map-side combine), so the full-outer join carries
    * |distinct keys| bounded rows regardless of fact volume, and both
    * inputs share the key partitioning. One scan per side, one
    * shuffle each, one bounded join.
    */
  def refIntegrity(
      left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column): DataFrame = {
    val l = left.select(leftKey.as("__k"))
      .groupBy(col("__k")).agg(count(lit(1)).as("ln"))
    val r = right.select(rightKey.as("__k"))
      .groupBy(col("__k")).agg(count(lit(1)).as("rn"))
    l.join(r, Seq("__k"), "full_outer").agg(
      count(when(col("rn").isNull, 1)).as("n_left_only_keys"),
      count(when(col("ln").isNull, 1)).as("n_right_only_keys"),
      count(when(col("ln").isNotNull && col("rn").isNotNull, 1))
        .as("n_matched_keys"),
      coalesce(sum(when(col("ln") > 1, lit(1))), lit(0L))
        .cast("long").as("n_dup_left_keys"),
      coalesce(sum(when(col("rn") > 1, lit(1))), lit(0L))
        .cast("long").as("n_dup_right_keys"),
      coalesce(sum(when(col("rn").isNull, col("ln"))), lit(0L))
        .cast("long").as("n_orphan_left_rows"))
  }

  /** k-anonymity audit over a quasi-identifier combination: every
    * combination of `quasiCols` values shared by FEWER than `k` rows
    * is a re-identification risk (the released rows are distinguishable
    * down to a group smaller than k — Sweeney's criterion). Emits the
    * violating combinations with their group sizes, so the caller can
    * suppress, generalize, or reject the release. An empty result =
    * the projection is k-anonymous.
    *
    * NULL quasi-identifier values group together (a null is as
    * identifying as any other shared value in a release).
    *
    * Scale: ONE hash aggregate over the quasi columns (map-side
    * combine) + the size filter — violations are by definition the
    * SMALL groups, so the output is tiny even when the input is not.
    * For the companion "how anonymous are we" scalar, aggregate the
    * result (`min(group_size)` over all groups is a second bounded
    * aggregate callers can run on the same grouped frame).
    */
  def kAnonymityViolations(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2L, s"k-anonymity needs k >= 2, got $k")
    df.groupBy(quasiCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
  }

  /** l-diversity audit: among the groups that PASS k-anonymity sized
    * grouping, a sensitive attribute with fewer than `l` distinct
    * values per group still leaks it (everyone in the group shares
    * it — homogeneity attack). Emits quasi combinations whose
    * sensitive diversity is below `l`, with group size and the
    * distinct count. One aggregate, exact distinct per group.
    */
  def lDiversityViolations(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(l >= 2L, s"l-diversity needs l >= 2, got $l")
    df.groupBy(quasiCols.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("group_size"),
        countDistinct(col(s"`$sensitiveCol`")).as("n_sensitive"))
      .filter(col("n_sensitive") < l)
  }

  /** Order-free table fingerprint for cross-engine / cross-snapshot
    * validation — "did the migration copy every row, exactly once":
    * each row keys to the first 60 bits of md5 over a canonical
    * textual encoding of `cols` (unit-separator-joined, NULL as the
    * SOH sentinel so `(NULL, "x")` ≠ `("", "x")` ≠ `("x",)`),
    * and the table's checksum is the exact SUM of those keys mod
    * 2⁵³−1 — commutative, so any engine, any partitioning, any row
    * order produces the identical pair `(n_rows, checksum)`. A
    * single dropped, duplicated, or altered row moves it (up to the
    * 2⁻⁶⁰-per-row md5 collision class — the module's standard hash
    * tolerance).
    *
    * Caller contract: provide columns whose STRING rendering is
    * engine-canonical (strings, integers, dates; scale doubles to
    * integer cents first — float formatting is where engines
    * disagree). 100 TB shape: map-side partial sums, one single-row
    * result; nothing shuffles but the partials.
    */
  def tableChecksum(df: DataFrame, cols: Seq[Column]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val canon = concat_ws("\u001f",
      cols.map(c => coalesce(c.cast("string"), lit("\u0001"))): _*)
    val u60 = conv(substring(md5(canon), 1, 15), 16, 10)
      .cast("decimal(38,0)")
    df.agg(count(lit(1)).as("n_rows"),
      coalesce(pmod(sum(u60), lit(BigDecimal((1L << 53) - 1)))
        .cast("long"), lit(0L)).as("checksum"))
  }
}

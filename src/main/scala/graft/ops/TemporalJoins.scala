package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: backward and
  * forward as-of joins and the banded range join. All are compositions of
  * native operators (one hash shuffle + window, or one equi-join on a
  * derived bucket key) rather than the naive non-equi join, which
  * Spark can only plan as a broadcast-nested-loop / cartesian — the
  * classic 100 TB cliff for event-time enrichment.
  */
object TemporalJoins {

  /** Backward AS-OF join: for each left row, attach the right row with
    * the same key and the greatest `rightTime` <= `leftTime` (inclusive,
    * the standard financial-tick semantic; equal timestamps match).
    * Left rows with no prior right row keep nulls — a LEFT as-of.
    *
    * Plan shape: tag both sides, union, ONE shuffle on `keys`, then a
    * running `last(value, ignoreNulls)` over the (time, side)-sorted
    * stream — right rows sort before left rows at equal timestamps, so
    * the carry is inclusive. Cost is one sort-shuffle of |L|+|R| rows
    * regardless of time-gap distribution; the non-equi formulation
    * (`l.t >= r.t` range join) would be a per-key cartesian. A hot key
    * serializes its partition's sort — salt upstream if one key holds
    * a material fraction of the corpus.
    *
    * Determinism: if the right side can carry multiple rows per
    * (key, time), pre-aggregate it — rows tied on (key, time) have no
    * defined winner (same as SQL engines' ASOF).
    *
    * Nulls: null-key rows group together (Spark window semantics, NOT
    * SQL join semantics — filter them upstream to match a SQL oracle);
    * right rows with a null time are dropped (they can never be the
    * most-recent-prior row).
    *
    * @param left      probe side; all its columns pass through
    * @param right     build side; every non-key column (including
    *                  `rightTime`) is attached to the output. Non-key
    *                  column names must not collide with `left`'s.
    * @param tolerance max lookback: matches older than
    *                  `leftTime - tolerance` are nulled out (the value
    *                  columns only — left rows always survive)
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Column] = None): DataFrame =
    asOfDirected(left, right, keys, leftTime, rightTime, tolerance,
      forward = false)

  /** Forward AS-OF join: the mirror semantic — the right row with the
    * SMALLEST `rightTime` >= `leftTime` (inclusive); "the next event
    * after". Same one-shuffle window-carry plan, scanning time
    * descending; `tolerance` bounds the look-AHEAD
    * (`rightTime <= leftTime + tolerance`).
    */
  def asOfJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Column] = None): DataFrame =
    asOfDirected(left, right, keys, leftTime, rightTime, tolerance,
      forward = true)

  private def asOfDirected(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Column],
      forward: Boolean): DataFrame = {
    val rVals = right.columns.filterNot(keys.contains).toSeq
    val lOther = left.columns.filterNot(keys.contains).toSeq
    require(rVals.intersect(lOther).isEmpty,
      s"right value columns ${rVals.intersect(lOther).mkString(",")} collide with left")
    val reserved = Seq("_t", "_side", "_rv")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"column names ${reserved.mkString("/")} are reserved by asOfJoin")
    // the right row rides as ONE struct so the carry is all-or-nothing:
    // carrying each value column through its own last(_, ignoreNulls)
    // would resurrect an older row's value wherever the latest row has
    // a null field — an output row torn across two right rows
    val rvType = org.apache.spark.sql.types.StructType(
      rVals.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)))
    val lPart = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side")) ++
        lOther.map(col) :+
        lit(null).cast(rvType).as("_rv"): _*)
    val rPart = right.na.drop(Seq(rightTime)).select(
      keys.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side")) ++
        lOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rVals.map(col): _*).as("_rv"): _*)
    // scan order: time ascending for backward (carry = most recent
    // prior), descending for forward (carry = nearest future); right
    // rows sort before left rows at equal times either way, keeping
    // the boundary inclusive. Null left times must scan BEFORE any
    // right row in both directions (nulls compare to nothing, so they
    // never match — same as the SQL ASOF inequality): asc is
    // nulls-first already, desc needs it forced.
    val timeOrder = if (forward) col("_t").desc_nulls_first else col("_t").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lPart.unionByName(rPart).select(
      keys.map(col) ++ Seq(col("_t"), col("_side")) ++ lOther.map(col) :+
        last(col("_rv"), ignoreNulls = true).over(w).as("_rv"): _*)
    val matchedOk = tolerance match {
      case None => lit(true)
      case Some(tol) if forward => col("_rv").getField(rightTime) <= col("_t") + tol
      case Some(tol) => col("_rv").getField(rightTime) >= col("_t") - tol
    }
    carried
      .filter(col("_side") === 1)
      .select(
        keys.map(col) ++ lOther.map(col) ++
          rVals.map(c => when(matchedOk, col("_rv").getField(c)).as(c)): _*)
  }

  /** Banded RANGE join: pairs with equal `keys` and
    * `rightTime` ∈ (`leftTime`, `leftTime` + `maxGapSec`] — "everything
    * that happened up to maxGap after each probe row".
    *
    * Plan shape: both sides bucket time by `maxGapSec`; the left side
    * probes its own bucket and the next one (any in-band match lands in
    * one of the two), so the non-equi predicate becomes ONE equi-join
    * on (keys, bucket) plus a residual filter — a hash join that scales
    * with true match volume, where Spark's native plan for the raw
    * inequality is a per-key nested loop. This is the standard
    * interval-binning scheme (cf. bucketed range joins in Databricks /
    * Flink window joins).
    *
    * The band predicate is evaluated on the exact timestamps, so bucket
    * granularity affects cost only, never results.
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      maxGapSec: Long): DataFrame = {
    require(maxGapSec > 0, s"maxGapSec must be positive, got $maxGapSec")
    require(!(left.columns ++ right.columns).contains("_bkt"),
      "column name _bkt is reserved by bandJoin")
    val sharedNonKey = (left.columns.toSet -- keys) & (right.columns.toSet -- keys)
    require(sharedNonKey.isEmpty,
      s"non-key columns ${sharedNonKey.mkString(",")} exist on both sides — " +
        "rename one side (the residual filter would be ambiguous)")
    val lBkt = floor(col(leftTime).cast("double") / maxGapSec.toDouble)
      .cast("long")
    val rBkt = floor(col(rightTime).cast("double") / maxGapSec.toDouble)
      .cast("long")
    val probes = left.withColumn("_bkt", explode(array(lBkt, lBkt + 1)))
    val build = right.withColumn("_bkt", rBkt)
    // the residual upper bound must match the time column's type:
    // calendar interval for timestamps, plain seconds for numeric
    // epoch columns (interval + double doesn't type-check)
    val upper = left.schema(leftTime).dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
        col(leftTime) + lit(maxGapSec)
      case _ => col(leftTime) + expr(s"INTERVAL $maxGapSec SECOND")
    }
    probes.join(build, keys :+ "_bkt")
      .filter(col(rightTime) > col(leftTime) && col(rightTime) <= upper)
      .drop("_bkt")
  }

  /** Interval-OVERLAP join: pairs with equal `keys` whose closed
    * intervals `[startA, endA]` and `[startB, endB]` intersect
    * (`sA ≤ eB ∧ sB ≤ eA`) — resource-conflict detection, session
    * co-presence, validity-window reconciliation.
    *
    * Plan shape (the bandJoin scheme generalized to two intervals):
    * each interval explodes to every `binWidth` bucket it covers, the
    * non-equi predicate becomes ONE equi-join on (keys, bucket) plus
    * the exact residual filter, and — the dedupe-free trick — a
    * qualifying pair is kept only in the single CANONICAL bucket
    * containing `max(sA, sB)` (the overlap's start), so each pair is
    * produced exactly once with no distinct pass. Spark's native plan
    * for the raw inequality is a per-key nested loop; this is a hash
    * join whose cost is (interval length / binWidth) explosion factor
    * plus true match volume — pick `binWidth` near the typical
    * interval length (time-column units: seconds for timestamps).
    *
    * Bucket granularity affects cost only, never results (the
    * residual runs on the exact endpoints). Intervals must satisfy
    * `end ≥ start`; both sides' non-key columns must be disjoint.
    */
  def intervalOverlapJoin(
      a: DataFrame,
      b: DataFrame,
      keys: Seq[String],
      startA: String, endA: String,
      startB: String, endB: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!(a.columns ++ b.columns).contains("_bkt"),
      "column name _bkt is reserved by intervalOverlapJoin")
    val sharedNonKey = (a.columns.toSet -- keys) & (b.columns.toSet -- keys)
    require(sharedNonKey.isEmpty,
      s"non-key columns ${sharedNonKey.mkString(",")} exist on both sides — " +
        "rename one side (the residual filter would be ambiguous)")
    def bin(c: String): Column =
      floor(col(c).cast("double") / binWidth.toDouble).cast("long")
    def covered(s: String, e: String): Column =
      explode(sequence(bin(s), bin(e)))
    val ax = a.withColumn("_bkt", covered(startA, endA))
    val bx = b.withColumn("_bkt", covered(startB, endB))
    val canonical = col("_bkt") ===
      floor(greatest(col(startA).cast("double"), col(startB).cast("double"))
        / binWidth.toDouble).cast("long")
    ax.join(bx, (keys :+ "_bkt").toSeq)
      .filter(col(startA) <= col(endB) && col(startB) <= col(endA))
      .filter(canonical)
      .drop("_bkt")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how many users performed stage 1, then
  * stage 2 STRICTLY AFTER their first stage-1 event, then stage 3
  * strictly after that, … — the classic product-analytics conversion
  * funnel, with first-occurrence semantics (a user converts at the
  * EARLIEST time they complete each prefix, which makes the whole
  * computation a chain of min-aggregates — no per-user event-sequence
  * scan, no window sort).
  *
  * Scale shape: every stage is one filter (scan-side predicate
  * pushdown on the event type) → join against the previous stage's
  * (user, t) table → min-aggregate, ALL keyed on the user — the chain
  * re-uses one hash partitioning end to end (AQE exchange reuse), and
  * each stage's state is one bounded row per surviving user. Per-user
  * event volume never concentrates in a task, unlike
  * collect-the-user's-events-and-fold designs. Intermediate stage
  * tables are persisted because stage k's plan is read by stages
  * k+1..n AND by its own count branch (caller/session owns
  * clearCache — the tfidf/bm25 contract).
  */
object Funnel {

  /** The per-stage `(user, first-completion-time)` tables — the state
    * the funnel chain runs on, one frame per stage prefix, shared by
    * [[funnelCounts]] (which counts them) and latency analyses (which
    * join them: time-to-convert for a user = stage k's time minus
    * stage 1's). Each frame is persisted (read by the next stage and
    * by the caller; caller/session owns clearCache).
    */
  def stageTimes(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      stages: Seq[String]): Seq[DataFrame] = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val base = events.select(
      userCol.as("__u"), tsCol.as("__ts"), typeCol.as("__ty"))
    var reached: DataFrame = null
    stages.zipWithIndex.map { case (st, i) =>
      val hits = base.filter(col("__ty") === lit(st))
      reached =
        (if (i == 0) hits
         else hits
           .join(reached.withColumnRenamed("__t", "__prev"), Seq("__u"))
           .filter(col("__ts") > col("__prev")))
          .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
          .persist()
      reached
    }
  }

  /** Per-stage cumulative conversion counts:
    * `(stage, step ∈ 1..n, n_users)` — n_users monotonically
    * non-increasing down the funnel.
    */
  def funnelCounts(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      stages: Seq[String]): DataFrame = {
    val times = stageTimes(events, userCol, tsCol, typeCol, stages)
    stages.zip(times).zipWithIndex.map { case ((st, reached), i) =>
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(st).as("stage"), lit(i + 1).as("step"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Time-to-convert histogram: users who completed the WHOLE funnel,
    * banded by `floor((t_last − t_first) / bandWidthUs)` microseconds
    * — fixed value bands (the q_lm_buckets rule: a percentile would
    * need a global sort; bands are one hash aggregate and exact
    * integer arithmetic, so the histogram is layout/engine-exact).
    * Emits `(band, n_users, min_us, max_us)` for occupied bands.
    */
  def conversionLatencyBands(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      stages: Seq[String],
      bandWidthUs: Long): DataFrame = {
    require(stages.size >= 2, "latency needs at least two stages")
    require(bandWidthUs > 0, s"bandWidthUs must be positive: $bandWidthUs")
    val times = stageTimes(events, userCol, tsCol, typeCol, stages)
    val first = times.head.select(col("__u"), unix_micros(col("__t")).as("__t0"))
    val last = times.last.select(col("__u"), unix_micros(col("__t")).as("__t1"))
    last.join(first, Seq("__u"))
      .select((col("__t1") - col("__t0")).as("__d"))
      .groupBy(expr(s"__d div ${bandWidthUs}L").as("band"))
      .agg(count(lit(1)).as("n_users"),
        min(col("__d")).as("min_us"), max(col("__d")).as("max_us"))
  }
}

package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan

/** Certified plan-shape audit (VERDICT r12 Next #6): the engine's
  * scale claims rest on plan INVARIANTS — joins that broadcast,
  * exchanges that don't multiply, no accidental cartesians, top-k
  * that stays `TakeOrderedAndProject` — and until now those were
  * pinned only in ScalaTest regexes (PlanSpec). This surface promotes
  * the audit to an oracle-checked QUERY: a fixed list of stable
  * queries is PLANNED (never executed — `queryExecution.sparkPlan`,
  * the deterministic pre-AQE physical plan) and reduced to a row of
  * physical-node counts, which the DuckDB oracle pins as literal
  * VALUES. A plan regression — a broadcast that silently becomes a
  * sort-merge join, a new exchange, a cartesian — now fails the
  * correctness gate as a hash mismatch instead of waiting for a
  * human to read `.explain`.
  *
  * Most audited queries are construction-pure (no fixture induction,
  * no eager checkpoint at build time) so auditing them runs zero
  * Spark jobs; the four scale-claim representatives materialize
  * bounded state at construction (see [[Audited]]'s note). In every
  * case the emitted counts depend only on the query text, the
  * session conf the engine itself pins ([[graft.GraftSession]]), and
  * the driver-generated testdata's statistics — deterministic at the
  * correctness gate's sf0.01.
  */
object PlanMetrics {

  /** The audited list: one representative per certified plan-shape
    * family — flagship agg, star join, enrich/upsert joins, anti
    * join, point lookup, top-k, window, set op, plus (r14) one
    * representative per LLM-pipeline SCALE claim: the banded
    * near-dup join (no cartesian, the (b, v) exchange shape), banded
    * top-k search (bounded-heap aggregate, never a window sort), the
    * prefix-filtered pair path (exchange count; broadcast-probe
    * verify — audited through the Jaccard form: the containment twin
    * shares the machinery but MATERIALIZES-then-releases its result
    * by contract, so its "plan" is a scan of the checkpoint), and
    * the Bloom-gated exact incremental dedup (probe in the scan
    * stage). KEEP stable: every name here has a pinned row
    * in the q_plan_audit oracle, and editing one of these queries
    * means re-pinning its row (that is the feature, not a chore —
    * the diff IS the plan review).
    *
    * Construction purity: the first ten queries build zero Spark
    * jobs. The four scale representatives materialize BOUNDED state
    * at plan construction (the modality pipelines localCheckpoint
    * their hash frame; the dedup query builds its Bloom; the prefix
    * path runs one count to pick its verify strategy) — bounded at
    * the gate's sf0.01 and irrelevant to the emitted row, which
    * counts node classes of the resulting static plan and stays
    * deterministic given the pinned session conf.
    */
  val Audited: Seq[String] = Seq(
    "q1_lineitem_agg",
    "q5_local_supplier_volume",
    "q_daily_load",
    "q_membership_level",
    "q_top5_sales",
    "q_point_lookup",
    "q_sync_delete_antijoin",
    "q_window_rank",
    "q_union_all",
    "q_exists_semijoin",
    "q_image_neardup",
    "q_image_search",
    "q_ngram_jaccard_prefix",
    "q_dedup_incremental_exact")

  final case class PlanRow(
      query: String,
      n_exchanges: Int,
      n_broadcast_joins: Int,
      n_sort_merge_joins: Int,
      n_hash_aggregates: Int,
      has_cartesian: Boolean,
      has_topk: Boolean)

  /** Reduce one physical plan to its audit row. Node classes, not
    * string greps — subqueries are traversed too (a broadcast-filter
    * subquery hides real exchange work).
    */
  def rowFor(name: String, plan: SparkPlan): PlanRow = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    def all(p: SparkPlan): Seq[SparkPlan] =
      p.collectWithSubqueries { case n => n }
    val nodes = all(plan)
    PlanRow(name,
      n_exchanges = nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
      n_broadcast_joins =
        nodes.count(_.isInstanceOf[BroadcastHashJoinExec]),
      n_sort_merge_joins =
        nodes.count(_.isInstanceOf[SortMergeJoinExec]),
      n_hash_aggregates =
        nodes.count(_.isInstanceOf[HashAggregateExec]),
      has_cartesian = nodes.exists(n =>
        n.isInstanceOf[CartesianProductExec] ||
          n.isInstanceOf[BroadcastNestedLoopJoinExec]),
      has_topk =
        nodes.exists(_.isInstanceOf[TakeOrderedAndProjectExec]))
  }

  /** Plan (never execute) every audited query at `sfDir` and emit
    * the metric rows, ordered by query name. The audited plan is the
    * PREPARED static plan (`executedPlan` — after EnsureRequirements
    * inserts the exchanges, which is the whole point of counting
    * them) with AQE off for the planning call: under AQE the
    * pre-execution plan is one opaque AdaptiveSparkPlan wrapper whose
    * final shape only exists after running — the static plan is the
    * deterministic, execution-free surface. Preparation runs no jobs.
    */
  def audit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val key = "spark.sql.adaptive.enabled"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      Audited.sorted.map { name =>
        rowFor(name,
          graft.SparkEntry.queries(name)(spark, sfDir)
            .queryExecution.executedPlan)
      }.toDS().toDF()
    } finally spark.conf.set(key, saved)
  }
}

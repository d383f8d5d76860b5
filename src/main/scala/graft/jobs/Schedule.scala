package graft.jobs

import java.time.{Duration, Instant, ZoneOffset, ZonedDateTime}

import org.apache.spark.sql.SparkSession

import graft.streaming.TableStore

/** The reference's third program is Airflow: two scheduled DAGs —
  * `@hourly` for the incremental sync and `0 22 * * *` for the daily
  * load, both `catchup=False` (`airflow/dags/POS_spark_dag.py:
  * 438–465`). This is the deterministic core of that scheduler-shape:
  * the WINDOW ALGEBRA (which closed data window is due at a given
  * instant) plus a completion ledger in [[TableStore]] meta, so a
  * runner invoked by any clock source (cron, a loop, a test) runs
  * each window's job EXACTLY ONCE and safely no-ops on re-invocation.
  * No daemon, no threads — the caller owns the clock and passes `now`
  * explicitly, which is also what makes every semantics testable.
  *
  * Semantics (Airflow-faithful):
  *  - a run at instant `now` is due for the LATEST fully-closed
  *    window `[floor(now) - period, floor(now))`; data for a window
  *    is only processed after the window closes;
  *  - `catchup = false`: if several windows elapsed since the last
  *    completed one (scheduler was down), only the latest runs; the
  *    skipped count is reported, not silently dropped;
  *  - completion records AFTER the job body returns — a crash between
  *    run and record re-runs the window on the next invocation, so
  *    job bodies must be idempotent (the engine's sinks are: upsert
  *    by key, [[TableStore]] atomic snapshots, exactly-once
  *    foreachBatch);
  *  - re-invocation inside an already-completed window is a no-op.
  */
object Schedule {

  /** A fixed-boundary schedule: `floorBoundary` is the latest
    * boundary ≤ t, `period` the distance between boundaries.
    */
  sealed trait Spec {
    def floorBoundary(t: Instant): Instant
    def period: Duration
  }

  /** `@hourly` (POS_spark_dag.py:442): boundaries at :00. */
  case object Hourly extends Spec {
    val period: Duration = Duration.ofHours(1)
    def floorBoundary(t: Instant): Instant = {
      val z = t.atZone(ZoneOffset.UTC)
      z.withMinute(0).withSecond(0).withNano(0).toInstant
    }
  }

  /** `M H * * *` (the reference's `0 22 * * *`, POS_spark_dag.py:450):
    * one boundary per UTC day at `hour:minute`.
    */
  final case class DailyAt(hour: Int, minute: Int = 0) extends Spec {
    require(hour >= 0 && hour < 24, s"hour out of range: $hour")
    require(minute >= 0 && minute < 60, s"minute out of range: $minute")
    val period: Duration = Duration.ofDays(1)
    def floorBoundary(t: Instant): Instant = {
      val z = t.atZone(ZoneOffset.UTC)
      val today: ZonedDateTime =
        z.withHour(hour).withMinute(minute).withSecond(0).withNano(0)
      (if (today.toInstant.isAfter(t)) today.minusDays(1) else today)
        .toInstant
    }
  }

  /** The closed window due at `now`: `[boundary - period, boundary)`
    * where boundary = floorBoundary(now).
    */
  def dueWindow(spec: Spec, now: Instant): (Instant, Instant) = {
    val end = spec.floorBoundary(now)
    (end.minus(spec.period), end)
  }

  sealed trait Outcome
  /** The window ran (and `skippedWindows` older due windows were
    * passed over — catchup=False).
    */
  final case class Ran(windowStart: Instant, windowEnd: Instant,
      skippedWindows: Long) extends Outcome
  /** The due window is already recorded complete — nothing ran. */
  final case class AlreadyComplete(windowEnd: Instant) extends Outcome
}

/** One job's schedule state over a [[TableStore]]: `run` computes the
  * due window, no-ops when it is already complete, otherwise invokes
  * the body and records completion. The ledger is the
  * `sched_<job>` table's snapshot meta (`completed_until` = epoch
  * micros of the completed window end) — written through the store's
  * atomic version flip, so a reader never observes a half-recorded
  * completion, and the one-row table body is the human-readable
  * audit record of the same fact.
  */
final class ScheduleRunner(
    store: TableStore,
    job: String,
    spec: Schedule.Spec) {
  import Schedule._

  private val ledger = s"sched_$job"

  /** Epoch-micros end of the last completed window, if any. */
  def completedUntil(): Option[Instant] =
    store.readMeta(ledger).get("completed_until")
      .map(us => Instant.EPOCH.plus(Duration.ofNanos(us.toLong * 1000L)))

  /** Run the due window at `now` if it is not yet complete.
    *
    * Exactly-once per window given an idempotent body: completion is
    * recorded only after `body` returns, so a crash between the two
    * re-runs the SAME window next invocation (at-least-once execution,
    * exactly-once ledger effect); a second invocation after recording
    * is a no-op.
    */
  def run(spark: SparkSession, now: Instant)(
      body: (Instant, Instant) => Unit): Outcome = {
    val (start, end) = dueWindow(spec, now)
    completedUntil() match {
      case Some(done) if !done.isBefore(end) => AlreadyComplete(end)
      case done =>
        // catchup=False: windows strictly between the last completed
        // end and this window's start are skipped, never run
        val skipped = done.fold(0L) { d =>
          math.max(0L, Duration.between(d, start).dividedBy(spec.period))
        }
        body(start, end)
        val endUs = end.getEpochSecond * 1000000L + end.getNano / 1000L
        import spark.implicits._
        store.overwrite(ledger,
          Seq((job, endUs)).toDF("job", "completed_until_us"),
          meta = Map("completed_until" -> endUs.toString))
        Ran(start, end, skipped)
    }
  }
}

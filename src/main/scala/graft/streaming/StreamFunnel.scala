package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.streaming.GroupState

/** Streaming form of [[graft.ops.Funnel]]: per-user conversion-stage
  * tracking with `flatMapGroupsWithState` — emit a completion row the
  * moment a user finishes the next funnel stage, with O(1) state per
  * user (the awaited stage index + the last completion time).
  *
  * Semantics match the batch operator's strictly-after
  * first-occurrence contract EXACTLY when each user's events are
  * processed in event-time order: greedily taking the first
  * qualifying event in ts order IS the earliest-completion chain
  * (first stage-1 hit is min(t₁); the first stage-2 hit after it is
  * min(t₂ > t₁); induction up the funnel). Within a micro-batch the
  * function sorts the user's rows by (ts, type) — the batch iterator
  * is arrival-ordered, not time-ordered — so the contract holds for
  * any in-batch interleaving; ACROSS batches an event arriving late
  * (after a later-stage event already advanced the state) is not
  * retroactively applied, the standard streaming-analytics trade
  * (pair with a watermark-bounded replay if exact late-data repair is
  * required). Pinned against the batch operator in StreamFunnelSpec.
  *
  * Scale: state is two numbers per user in the checkpointed store
  * (RocksDB backend via [[StreamDedup.useRocksDBStateStore]] for
  * 10⁹-user cardinality), emission is append-mode completions.
  */
object StreamFunnel {

  final case class StageEvent(user_id: Long, ts_ms: Long, event_type: String)
  final case class FunnelState(next_stage: Int, last_ms: Long)
  final case class Completion(
      user_id: Long, stage: String, step: Int, ts_ms: Long)

  def advanceFunc(stages: IndexedSeq[String])(
      key: Long,
      rows: Iterator[StageEvent],
      state: GroupState[FunnelState]): Iterator[Completion] = {
    val sorted = rows.toIndexedSeq.sortBy(e => (e.ts_ms, e.event_type))
    var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
    val out = IndexedSeq.newBuilder[Completion]
    sorted.foreach { e =>
      if (st.next_stage < stages.length &&
          e.event_type == stages(st.next_stage) &&
          (st.next_stage == 0 || e.ts_ms > st.last_ms)) {
        out += Completion(key, e.event_type, st.next_stage + 1, e.ts_ms)
        st = FunnelState(st.next_stage + 1, e.ts_ms)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Wire the funnel onto a streaming Dataset of [[StageEvent]]s. */
  def completions(
      spark: SparkSession,
      events: Dataset[StageEvent],
      stages: Seq[String]): Dataset[Completion] = {
    require(stages.nonEmpty, "need at least one funnel stage")
    implicit val se: org.apache.spark.sql.Encoder[FunnelState] =
      Encoders.product[FunnelState]
    implicit val ce: org.apache.spark.sql.Encoder[Completion] =
      Encoders.product[Completion]
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        advanceFunc(stages.toIndexedSeq))
  }
}

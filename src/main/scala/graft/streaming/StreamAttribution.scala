package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of [[graft.ops.Attribution]]: emit an attributed
  * row the moment a conversion arrives, crediting the user's first
  * and most recent STRICTLY-PRECEDING touch — with O(1) state per
  * user (two channel strings). The real-time "what drove this
  * purchase" feed of an ads/analytics pipeline; the batch operator is
  * the backfill twin.
  *
  * Semantics match the batch window lookups EXACTLY when each user's
  * events arrive in event-time order: within a micro-batch the
  * function sorts the user's rows by `(ts, event_id)` (the batch
  * frame's total order), touches update state only AFTER any
  * conversion at the same `(ts, id)` position has been attributed —
  * i.e. a conversion sees exactly the touches strictly before it.
  * Across batches a late-arriving touch is not retroactively applied
  * (the [[StreamFunnel]] trade; replay the batch operator over the
  * watermark window if exact late-data repair is required). Pinned
  * against the batch operator in StreamAttributionSpec.
  *
  * Scale: state is two strings per user in the checkpointed store
  * (RocksDB backend via [[StreamDedup.useRocksDBStateStore]] for
  * 10⁹-user cardinality); emission is append-mode attributed
  * conversions.
  */
object StreamAttribution {

  final case class TouchEvent(
      user_id: Long, ts_ms: Long, event_id: Long, event_type: String,
      value: Double)
  final case class AttrState(
      first_touch: Option[String], last_touch: Option[String])
  final case class Attributed(
      user_id: Long, conversion_id: Long, ts_ms: Long,
      channel_first: Option[String], channel_last: Option[String],
      value: Double)

  def attributeFunc(touchTypes: Set[String], conversionType: String)(
      key: Long,
      rows: Iterator[TouchEvent],
      state: GroupState[AttrState]): Iterator[Attributed] = {
    val sorted = rows.toIndexedSeq.sortBy(e => (e.ts_ms, e.event_id))
    var st = state.getOption.getOrElse(AttrState(None, None))
    val out = IndexedSeq.newBuilder[Attributed]
    sorted.foreach { e =>
      if (e.event_type == conversionType)
        out += Attributed(key, e.event_id, e.ts_ms,
          st.first_touch, st.last_touch, e.value)
      if (touchTypes.contains(e.event_type))
        st = AttrState(st.first_touch.orElse(Some(e.event_type)),
          Some(e.event_type))
    }
    state.update(st)
    out.result().iterator
  }

  /** Wire attribution onto a streaming Dataset of [[TouchEvent]]s. */
  def attributed(
      spark: SparkSession,
      events: Dataset[TouchEvent],
      touchTypes: Seq[String],
      conversionType: String): Dataset[Attributed] = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    implicit val se: org.apache.spark.sql.Encoder[AttrState] =
      Encoders.product[AttrState]
    implicit val ae: org.apache.spark.sql.Encoder[Attributed] =
      Encoders.product[Attributed]
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        attributeFunc(touchTypes.toSet, conversionType))
  }
}

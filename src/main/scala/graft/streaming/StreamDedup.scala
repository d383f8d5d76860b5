package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup: emit each key's FIRST row, suppress every
  * later duplicate — the streaming form of
  * [[graft.dedup.Dedup.exactDedup]], for ingest pipelines where the
  * corpus arrives continuously and re-crawls/replays must not re-emit.
  *
  * State is one boolean per key in the checkpointed state store —
  * partition-parallel and crash-safe; `flatMapGroupsWithState`
  * (Append mode) because a group emits 0 or 1 rows per batch, not
  * exactly 1. At 100 TB key-cardinality the state store is the
  * bottleneck: key by a 16-byte content fingerprint, not the payload
  * (exactly what [[graft.text.TextOps.fingerprint]] is for), and use
  * RocksDB state backend + watermark-based state TTL when the dedup
  * horizon is bounded.
  */
object StreamDedup {

  def firstSeenFunc[K, V](
      key: K, rows: Iterator[V], state: GroupState[Boolean]): Iterator[V] = {
    if (state.exists) Iterator.empty
    else {
      state.update(true)
      // the batch may itself carry duplicates of a brand-new key:
      // first row wins, deterministically in batch order
      if (rows.hasNext) Iterator.single(rows.next()) else Iterator.empty
    }
  }

  /** Wire first-seen dedup onto a streaming Dataset keyed by `keyOf`. */
  def firstSeen[K: Encoder, V: Encoder](
      spark: SparkSession,
      ds: Dataset[V],
      keyOf: V => K): Dataset[V] = {
    implicit val boolEnc: Encoder[Boolean] =
      org.apache.spark.sql.Encoders.scalaBoolean
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(firstSeenFunc[K, V])
  }
}

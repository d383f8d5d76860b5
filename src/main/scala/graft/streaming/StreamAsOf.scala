package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row for the as-of state machine: join key (canonical JSON),
  * event time in epoch micros, side tag (1 = left/probe, 0 = right/
  * build), the row payload as canonical JSON, and the raw event-time
  * column — semantically redundant with `tUs` but it must stay in the
  * operator's input: Spark's streaming checker requires the
  * watermarked attribute in the flatMapGroupsWithState child.
  */
private[streaming] case class AsOfIn(
    kj: String, tUs: Long, side: Int, payload: String,
    _ts: java.sql.Timestamp)

/** A buffered row: event-time micros + payload JSON. */
private[streaming] case class AsOfBuf(tUs: Long, payload: String)

/** Per-key state: right rows not yet collapsible, left rows awaiting
  * their emission watermark.
  */
private[streaming] case class AsOfKeyState(
    rights: List[AsOfBuf], pending: List[AsOfBuf])

/** Emitted enrichment: left payload + matched right payload (null
  * when no in-tolerance prior right row exists).
  */
private[streaming] case class AsOfOut(
    kj: String, tUs: Long, left: String, right: String)

/** Streaming backward AS-OF enrichment — the streaming twin of
  * [[graft.ops.TemporalJoins.asOfJoin]]: each left event is enriched
  * with the same-key right row of greatest event time <= its own
  * (inclusive), emitted once the watermark proves no earlier right row
  * can still arrive.
  *
  * Why not a stream-stream join: Structured Streaming's joins emit
  * EVERY in-window pair; "the latest prior row" needs an argmax per
  * left event, i.e. custom state. This is the
  * `flatMapGroupsWithState` shape: state per key is the pending left
  * rows plus the right-row buffer, and both are BOUNDED —
  *  - a left row leaves state as soon as the watermark passes its
  *    event time (emission point: nothing earlier can arrive);
  *  - right rows at-or-below the watermark collapse to the single
  *    latest one (every future left is newer than the watermark, so
  *    older rights are shadowed); with a `toleranceSec` even that
  *    carry expires. State is O(rate x watermark delay) per key.
  *
  * Rows ride through the state machine as canonical JSON (µs-precision
  * timestamps), so the operator is schema-generic without reflective
  * encoders; column types must round-trip through JSON (atomics,
  * strings, µs timestamps, base64'd binary). Ties on (key, rightTime)
  * have no defined winner — pre-aggregate the right side, same
  * contract as the batch operator. Rows below the watermark at
  * arrival are DROPPED by the watermark operator before reaching the
  * state machine (standard Structured Streaming semantics) — the
  * watermark delay is the out-of-orderness budget, exactly as in any
  * watermarked pipeline.
  *
  * Append-mode output: left columns then right value columns, the
  * batch asOfJoin's column contract.
  */
object StreamAsOf {

  private val TsFmt = Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")

  def asOfEnrich(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      watermark: String = "1 hour",
      toleranceSec: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._

    val rVals = right.columns.filterNot(keys.contains).toSeq
    val lCols = left.columns.toSeq
    require(rVals.intersect(lCols).isEmpty,
      s"right value columns ${rVals.intersect(lCols).mkString(",")} collide with left")
    // fail at PLAN time on types that cannot round-trip through the
    // JSON state machine — from_json would otherwise deserialize them
    // to silent NULLs after a green-looking start
    validateJsonRoundTrip("left", left.schema)
    validateJsonRoundTrip("right", right.schema)

    // null event times are dropped on BOTH sides: a left row without a
    // time has no position in event time, so it can neither be
    // watermark-gated nor matched (the batch twin emits it unmatched —
    // the one documented divergence); letting it through would crash
    // the deserializer on the non-nullable tUs field
    val lTagged = left.na.drop(Seq(leftTime)).select(
      to_json(struct(keys.map(col): _*), TsFmt).as("kj"),
      col(leftTime).as("_ts"),
      lit(1).as("side"),
      to_json(struct(lCols.map(col): _*), TsFmt).as("payload"))
    val rTagged = right.na.drop(Seq(rightTime)).select(
      to_json(struct(keys.map(col): _*), TsFmt).as("kj"),
      col(rightTime).as("_ts"),
      lit(0).as("side"),
      to_json(struct(rVals.map(col): _*), TsFmt).as("payload"))

    val tolUs = toleranceSec.map(_ * 1000000L)
    val enriched: Dataset[AsOfOut] = lTagged.unionByName(rTagged)
      .withWatermark("_ts", watermark)
      .select(col("kj"), unix_micros(col("_ts")).as("tUs"),
        col("side"), col("payload"), col("_ts"))
      .as[AsOfIn]
      .groupByKey(_.kj)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        stateFn(tolUs))

    // unpack the JSON payloads back to columns
    val lSchema = org.apache.spark.sql.types.StructType(
      lCols.map(c => org.apache.spark.sql.types.StructField(
        c, left.schema(c).dataType)))
    val rSchema = org.apache.spark.sql.types.StructType(
      rVals.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)))
    enriched.toDF()
      .select(
        from_json(col("left"), lSchema, TsFmt).as("_l"),
        from_json(col("right"), rSchema, TsFmt).as("_r"))
      .select(
        lCols.map(c => col("_l").getField(c).as(c)) ++
          rVals.map(c => col("_r").getField(c).as(c)): _*)
  }

  /** Enforce the documented "rows ride as canonical JSON" contract:
    * calendar-interval values have no JSON round-trip, and JSON object
    * keys are strings, so maps with non-string keys cannot come back
    * (from_json fails with INVALID_JSON_MAP_KEY_TYPE). Binary is FINE:
    * to_json base64-encodes it and from_json decodes it back —
    * pinned by StreamAsOfSpec — which matters because multimodal
    * payloads are binary columns. Recursive so nested
    * structs/arrays/maps are checked too.
    */
  private def validateJsonRoundTrip(
      side: String, schema: org.apache.spark.sql.types.StructType): Unit = {
    import org.apache.spark.sql.types._
    def check(path: String, dt: DataType): Unit = dt match {
      case CalendarIntervalType =>
        throw new IllegalArgumentException(
          s"asOfEnrich: $side column $path has type ${dt.simpleString}, " +
            "which does not round-trip through the JSON state payload; " +
            "drop or re-encode it first")
      case m: MapType if m.keyType != StringType =>
        throw new IllegalArgumentException(
          s"asOfEnrich: $side column $path is a map with " +
            s"${m.keyType.simpleString} keys; JSON object keys are " +
            "strings, so the map cannot round-trip — stringify the keys")
      case s: StructType =>
        s.fields.foreach(f => check(s"$path.${f.name}", f.dataType))
      case a: ArrayType => check(s"$path[]", a.elementType)
      case m: MapType => check(s"$path{}", m.valueType)
      case _ => ()
    }
    schema.fields.foreach(f => check(f.name, f.dataType))
  }

  /** The per-key state transition. Pure over (new rows, old state,
    * watermark) — unit-tested directly against the batch operator.
    */
  private def stateFn(tolUs: Option[Long])(
      kj: String,
      rows: Iterator[AsOfIn],
      state: GroupState[AsOfKeyState]): Iterator[AsOfOut] = {
    val st = state.getOption.getOrElse(AsOfKeyState(Nil, Nil))
    val (ls, rs) = rows.toList.partition(_.side == 1)
    val rights = st.rights ++ rs.map(r => AsOfBuf(r.tUs, r.payload))
    val pending = st.pending ++ ls.map(l => AsOfBuf(l.tUs, l.payload))
    val wmUs = state.getCurrentWatermarkMs() * 1000L

    // a left row is final once the watermark passes its event time
    val (emit, keep) = pending.partition(_.tUs <= wmUs)
    val out = emit.sortBy(_.tUs).map { l =>
      val prior = rights.filter(_.tUs <= l.tUs)
      val m = if (prior.isEmpty) None
        else Some(prior.maxBy(b => (b.tUs, b.payload)))
      val inTol = m.exists(b => tolUs.forall(t => b.tUs >= l.tUs - t))
      AsOfOut(kj, l.tUs, l.payload, if (inTol) m.get.payload else null)
    }

    // rights at-or-below the watermark collapse to the single latest;
    // with a tolerance even that carry expires once it can no longer
    // be in range for any future (post-watermark) left row
    val (old, live) = rights.partition(_.tUs <= wmUs)
    val carry = if (old.isEmpty) Nil else {
      val latest = old.maxBy(b => (b.tUs, b.payload))
      if (tolUs.forall(t => latest.tUs >= wmUs - t)) List(latest) else Nil
    }
    val keptRights = carry ++ live

    if (keep.isEmpty && keptRights.isEmpty) state.remove()
    else {
      state.update(AsOfKeyState(keptRights, keep))
      // Spark clears the per-key timeout on every invocation, so any
      // future wake-up must be re-registered here or the key is never
      // visited again without new data. Three reasons to wake:
      //  - pending lefts: at the earliest emission point;
      //  - a tolerance: at the latest right's expiry, so dead carries
      //    are removed instead of living forever;
      //  - >1 buffered rights: once the watermark passes the latest
      //    one they collapse to a single carry.
      // (A single carry with no tolerance is permanent by design —
      // that IS the as-of dimension state.)
      val wakeUs: Option[Long] =
        if (keep.nonEmpty) Some(keep.map(_.tUs).min)
        else {
          val horizon = keptRights.map(_.tUs).max
          if (tolUs.isDefined) Some(horizon + tolUs.get)
          else if (keptRights.size > 1) Some(horizon)
          else None
        }
      wakeUs.foreach(us => state.setTimeoutTimestamp(
        math.max(us / 1000L + 1L, state.getCurrentWatermarkMs() + 1L)))
    }
    out.iterator
  }
}

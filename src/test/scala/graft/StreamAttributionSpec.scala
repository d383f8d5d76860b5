package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Attribution
import graft.streaming.StreamAttribution
import graft.streaming.StreamAttribution.TouchEvent

/** The streaming attributor must agree with the batch window operator
  * when each user's events arrive in event-time order, and must carry
  * first/last-touch state across micro-batch boundaries.
  */
class StreamAttributionSpec extends SparkTestBase {
  import spark.implicits._

  private val touches = Seq("click", "view", "signup")

  test("touch state carries across micro-batches; rows match batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // u1 converts twice, state split across batches; u2 converts with
    // no touch ever (None channels); u3's touch ties its conversion's
    // ts but has the smaller event_id — strictly preceding, counts
    val batch1 = Seq(
      TouchEvent(1L, 1000L, 1L, "click", 0.0),
      TouchEvent(1L, 2000L, 2L, "view", 0.0),
      TouchEvent(1L, 3000L, 3L, "purchase", 10.0),
      TouchEvent(2L, 1000L, 4L, "purchase", 5.0))
    val batch2 = Seq(
      TouchEvent(1L, 4000L, 5L, "signup", 0.0),
      TouchEvent(1L, 5000L, 6L, "purchase", 20.0),
      TouchEvent(3L, 9000L, 7L, "view", 0.0),
      TouchEvent(3L, 9000L, 8L, "purchase", 7.0))
    val ms = MemoryStream[TouchEvent]
    val sink = StreamAttribution.attributed(spark, ms.toDS(),
        touches, "purchase")
      .writeStream.format("memory").queryName("sa_out")
      .outputMode("append").start()
    try {
      ms.addData(batch1: _*); sink.processAllAvailable()
      ms.addData(batch2: _*); sink.processAllAvailable()
    } finally sink.stop()
    val got = spark.table("sa_out")
      .select("conversion_id", "channel_first", "channel_last", "value")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)), r.getDouble(3))).toSet
    assert(got == Set(
      (3L, Some("click"), Some("view"), 10.0),
      (4L, None, None, 5.0),
      (6L, Some("click"), Some("signup"), 20.0),
      (8L, Some("view"), Some("view"), 7.0)))

    // batch-operator parity on the same events
    val events = (batch1 ++ batch2)
      .map(e => (e.event_id, e.user_id, new Timestamp(e.ts_ms),
        e.event_type, e.value))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val batchRows = Attribution.attribute(events, col("user_id"),
        col("ts"), col("event_id"), col("event_type"), col("value"),
        touches, "purchase")
      .select("conversion_id", "channel_first", "channel_last", "value")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)), r.getDouble(3))).toSet
    assert(batchRows == got,
      s"stream diverged from batch: $got vs $batchRows")
  }

  test("in-batch arrival order does not matter (ts,id)-sorted per user") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val shuffled = Seq( // reverse arrival order within one batch
      TouchEvent(7L, 3000L, 3L, "purchase", 1.0),
      TouchEvent(7L, 2000L, 2L, "click", 0.0),
      TouchEvent(7L, 1000L, 1L, "view", 0.0))
    val ms = MemoryStream[TouchEvent]
    val sink = StreamAttribution.attributed(spark, ms.toDS(),
        touches, "purchase")
      .writeStream.format("memory").queryName("sa_out2")
      .outputMode("append").start()
    try { ms.addData(shuffled: _*); sink.processAllAvailable() }
    finally sink.stop()
    val got = spark.table("sa_out2")
      .select("conversion_id", "channel_first", "channel_last")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)))).toSet
    assert(got == Set((3L, Some("view"), Some("click"))))
  }
}

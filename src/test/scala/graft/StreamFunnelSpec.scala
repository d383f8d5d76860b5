package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Funnel
import graft.streaming.StreamFunnel
import graft.streaming.StreamFunnel.StageEvent

/** The streaming funnel must agree with the batch operator when each
  * user's events arrive in event-time order, and must carry per-user
  * stage state across micro-batch boundaries.
  */
class StreamFunnelSpec extends SparkTestBase {
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  test("stage state carries across micro-batches; counts match batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // three users advancing at different paces, split mid-funnel
    // across batches; u2's early click (before view) must not count
    val batch1 = Seq(
      StageEvent(1L, 1000L, "view"), StageEvent(1L, 2000L, "click"),
      StageEvent(2L, 1000L, "click"), StageEvent(2L, 2000L, "view"),
      StageEvent(3L, 1000L, "view"))
    val batch2 = Seq(
      StageEvent(1L, 3000L, "purchase"),
      StageEvent(2L, 3000L, "click"), StageEvent(2L, 3000L, "purchase"))
    val ms = MemoryStream[StageEvent]
    val sink = StreamFunnel.completions(spark, ms.toDS(), stages)
      .writeStream.format("memory").queryName("sf_out")
      .outputMode("append").start()
    try {
      ms.addData(batch1: _*); sink.processAllAvailable()
      ms.addData(batch2: _*); sink.processAllAvailable()
    } finally sink.stop()
    val got = spark.table("sf_out")
      .select("user_id", "stage", "step", "ts_ms")
      .as[(Long, String, Int, Long)].collect().toSet
    assert(got == Set(
      (1L, "view", 1, 1000L), (1L, "click", 2, 2000L),
      (1L, "purchase", 3, 3000L),
      (2L, "view", 1, 2000L), (2L, "click", 2, 3000L),
      // u2's purchase ties its click at 3000 — strictly-after rejects
      (3L, "view", 1, 1000L)))
    // batch-operator parity on the same events
    val events = (batch1 ++ batch2)
      .map(e => (e.user_id, new Timestamp(e.ts_ms), e.event_type))
      .toDF("user_id", "ts", "event_type")
    val batchCounts = Funnel.funnelCounts(events, col("user_id"),
        col("ts"), col("event_type"), stages)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    val streamCounts = got.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    assert(batchCounts == streamCounts,
      s"stream diverged from batch: $streamCounts vs $batchCounts")
  }

  test("in-batch arrival order does not matter (ts-sorted per user)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val shuffled = Seq( // reverse arrival order within one batch
      StageEvent(7L, 3000L, "purchase"), StageEvent(7L, 2000L, "click"),
      StageEvent(7L, 1000L, "view"))
    val ms = MemoryStream[StageEvent]
    val sink = StreamFunnel.completions(spark, ms.toDS(), stages)
      .writeStream.format("memory").queryName("sf_out2")
      .outputMode("append").start()
    try { ms.addData(shuffled: _*); sink.processAllAvailable() }
    finally sink.stop()
    assert(spark.table("sf_out2").count() == 3,
      "full funnel not recognized from unordered in-batch arrival")
  }
}

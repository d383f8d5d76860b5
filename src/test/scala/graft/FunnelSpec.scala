package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Funnel

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("strictly-after first-occurrence funnel semantics") {
    val events = Seq(
      // u1 completes the full funnel in order
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // u2 clicks BEFORE viewing — click does not count; later click ok
      (2L, ts(1), "click"), (2L, ts(2), "view"), (2L, ts(3), "click"),
      // u3 views only
      (3L, ts(1), "view"),
      // u4 has click+purchase but never views — not in the funnel
      (4L, ts(1), "click"), (4L, ts(2), "purchase"),
      // u5: purchase simultaneous with click — strictly-after rejects
      (5L, ts(1), "view"), (5L, ts(2), "click"), (5L, ts(2), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelCounts(events, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .sortBy(_._2)
    assert(got.toSeq == Seq(
      ("view", 1, 4L),      // u1 u2 u3 u5
      ("click", 2, 3L),     // u1, u2 (second click), u5
      ("purchase", 3, 1L))) // u1 only (u5's tie rejected)
  }

  test("conversionLatencyBands bands first-view→completion exactly") {
    val events = Seq(
      // u1: view@1m → purchase@3m → delta 2m → band 0 (2m width)
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // u2: view@1m → purchase@7m → delta 6m → band 3
      (2L, ts(1), "view"), (2L, ts(5), "click"), (2L, ts(7), "purchase"),
      // u3 never purchases → absent
      (3L, ts(1), "view"), (3L, ts(2), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.conversionLatencyBands(events, col("user_id"),
        col("ts"), col("event_type"), Seq("view", "click", "purchase"),
        bandWidthUs = 2L * 60L * 1000000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((1L, 120000000L, 120000000L)),
      3L -> ((1L, 360000000L, 360000000L))), s"bands: $got")
  }

  test("funnel counts are monotonically non-increasing, any layout") {
    val events = Tables.events(spark, sfDir)
    val counts = Funnel.funnelCounts(events, col("user_id"), col("ts"),
        col("event_type"), Seq("signup", "view", "click", "purchase"))
      .collect().sortBy(_.getInt(1)).map(_.getLong(2))
    assert(counts.sliding(2).forall { case Array(a, b) => a >= b },
      s"funnel widened downstream: ${counts.toSeq}")
    val re = Funnel.funnelCounts(events.repartition(7), col("user_id"),
        col("ts"), col("event_type"),
        Seq("signup", "view", "click", "purchase"))
      .collect().sortBy(_.getInt(1)).map(_.getLong(2))
    assert(counts.toSeq == re.toSeq, "funnel depends on layout")
  }
}

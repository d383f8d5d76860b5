package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Attribution

class AttributionSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("first/last touch on a hand-checked timeline") {
    // user 1: click(t1) view(t2) purchase(t3) view(t4) purchase(t5)
    //   -> p@t3: first=click last=view; p@t5: first=click last=view(t4)
    // user 2: purchase with no touch -> both channels NULL
    // user 3: signup then purchase at the SAME ts, purchase id higher
    //   -> (ts, id) order puts signup strictly before
    val ev = Seq(
      (1L, 1L, ts(1), "click", 0.0), (2L, 1L, ts(2), "view", 0.0),
      (3L, 1L, ts(3), "purchase", 10.0), (4L, 1L, ts(4), "view", 0.0),
      (5L, 1L, ts(5), "purchase", 20.0),
      (6L, 2L, ts(1), "purchase", 5.0),
      (7L, 3L, ts(9), "signup", 0.0), (8L, 3L, ts(9), "purchase", 7.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Attribution.attribute(ev, col("user_id"), col("ts"),
        col("event_id"), col("event_type"), col("value"),
        Seq("click", "view", "signup"), "purchase")
      .select("conversion_id", "channel_first", "channel_last", "value")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)), r.getDouble(3))).toSet
    assert(got == Set(
      (3L, Some("click"), Some("view"), 10.0),
      (5L, Some("click"), Some("view"), 20.0),
      (6L, None, None, 5.0),
      (8L, Some("signup"), Some("signup"), 7.0)))
  }

  test("attribution is layout-independent and never crosses users") {
    val ev = (0 until 400).map { i =>
      val u = (i % 7).toLong
      val t = (i / 7).toLong
      val typ = if (i % 5 == 4) "purchase"
        else Seq("click", "view", "signup", "error")(i % 4)
      ((i + 1).toLong, u, ts(t), typ, (i % 13).toDouble)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val run = Attribution.attribute(ev, col("user_id"), col("ts"),
      col("event_id"), col("event_type"), col("value"),
      Seq("click", "view", "signup"), "purchase")
    val a = run.collect().map(_.toString).sorted.toSeq
    val b = Attribution.attribute(ev.repartition(11), col("user_id"),
        col("ts"), col("event_id"), col("event_type"), col("value"),
        Seq("click", "view", "signup"), "purchase")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b, "attribution depends on layout")
    // one attributed row per purchase event, no fan-out
    assert(a.size ==
      ev.filter(col("event_type") === "purchase").count())
  }

  test("markovTransitions: journeys reset at conversion; trailing " +
    "journey terminates in null") {
    // u1: click -> purchase | view -> purchase  (two journeys)
    // u2: view  (never converts -> view->null)
    // u3: purchase with no touch (start->conv directly)
    val ev = Seq(
      (1L, 1L, ts(1), "click", 0.0), (2L, 1L, ts(2), "purchase", 1.0),
      (3L, 1L, ts(3), "view", 0.0), (4L, 1L, ts(4), "purchase", 1.0),
      (5L, 2L, ts(1), "view", 0.0),
      (6L, 3L, ts(1), "purchase", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Attribution.markovTransitions(ev, col("user_id"),
        col("ts"), col("event_id"), col("event_type"),
        Seq("click", "view", "signup"), "purchase")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("start", "click", 1L), ("click", "conv", 1L),
      ("start", "view", 2L), ("view", "conv", 1L),
      ("view", "null", 1L), ("start", "conv", 1L)))
  }

  test("markovAttribution: hand-solved removal effects") {
    // u1: click -> purchase; u2: view (no conversion)
    // chain: start ->{click .5, view .5}; click -> conv; view -> null
    // P = 1/2; remove click -> 0; remove view -> 1/2 unchanged
    val ev = Seq(
      (1L, 1L, ts(1), "click", 0.0), (2L, 1L, ts(2), "purchase", 1.0),
      (3L, 2L, ts(1), "view", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Attribution.markovAttribution(ev, col("user_id"),
        col("ts"), col("event_id"), col("event_type"),
        Seq("click", "view", "signup"), "purchase")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("click", 500000000L, 1000000L),
      ("view", 0L, 0L), ("signup", 0L, 0L)))
  }

  test("markovAttribution: assist channel earns credit first-touch " +
    "never pays; effects nonnegative and layout-independent") {
    // every conversion path is view -> click -> purchase: last-touch
    // pays only click, but removing EITHER view or click kills all
    // conversions -> equal removal credit
    val rows = (0 until 40).flatMap { u =>
      Seq((u * 10L + 1, u.toLong, ts(u * 100L + 1), "view", 0.0),
        (u * 10L + 2, u.toLong, ts(u * 100L + 2), "click", 0.0),
        (u * 10L + 3, u.toLong, ts(u * 100L + 3), "purchase", 1.0))
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Attribution.markovAttribution(ev, col("user_id"),
        col("ts"), col("event_id"), col("event_type"),
        Seq("click", "view", "signup"), "purchase")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("view") == got("click"), "assist must earn like closer")
    assert(got("view")._1 > 0L)
    assert(got("signup") == ((0L, 0L)))
    assert(got.values.forall(_._1 >= 0L), "removal effects go negative")
    // layout independence: shuffled partitioning, same 3 rows
    val b = Attribution.markovAttribution(
        ev.repartition(7).sortWithinPartitions(desc("value")),
        col("user_id"), col("ts"), col("event_id"), col("event_type"),
        Seq("click", "view", "signup"), "purchase")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(b == got)
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Ewma

class EwmaSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("ewmaLast matches the hand-run recurrence; seed is x1") {
    // alpha = 1/2: s1=4, s2=.5*8+.5*4=6, s3=.5*2+.5*6=4
    val ev = Seq((1L, ts(1), 10L, 4.0), (1L, ts(2), 11L, 8.0),
      (1L, ts(3), 12L, 2.0), (2L, ts(9), 13L, 7.0))
      .toDF("k", "ts", "id", "x")
    val got = Ewma.ewmaLast(ev, col("k"), col("ts"), col("id"),
        col("x"), alphaNum = 1, alphaDen = 2)
      .select("key", "ewma", "n_samples")
      .as[(Long, Double, Int)].collect().toSet
    assert(got == Set((1L, 4.0, 3), (2L, 7.0, 1)))
  }

  test("order comes from (ts, tie), not arrival; layout-independent") {
    val rows = (0 until 500).map { i =>
      ((i % 9).toLong, ts(1000L - i), i.toLong, (i % 13).toDouble)
    }
    val df = rows.toDF("k", "ts", "id", "x")
    val a = Ewma.ewmaLast(df, col("k"), col("ts"), col("id"), col("x"), 1, 4)
      .as[(Long, Double, Int)].collect().toSet
    val b = Ewma.ewmaLast(df.repartition(11).sortWithinPartitions("x"),
        col("k"), col("ts"), col("id"), col("x"), 1, 4)
      .as[(Long, Double, Int)].collect().toSet
    assert(a == b, "EWMA depends on layout")
    // reference fold in plain Scala, same (ts, id) order
    val want = rows.groupBy(_._1).map { case (k, rs) =>
      val xs = rs.sortBy(r => (r._2.getTime, r._3)).map(_._4)
      val s = xs.tail.foldLeft(xs.head)((acc, x) => 0.25 * x + 0.75 * acc)
      (k, s, xs.size)
    }.toSet
    assert(a == want)
  }

  test("ties on ts break by the tie column") {
    val ev = Seq((1L, ts(5), 2L, 100.0), (1L, ts(5), 1L, 0.0))
      .toDF("k", "ts", "id", "x")
    // order: (5,1)=0.0 then (5,2)=100 → s = .5*100 + .5*0 = 50
    val got = Ewma.ewmaLast(ev, col("k"), col("ts"), col("id"),
        col("x"), 1, 2)
      .select("ewma").as[Double].head()
    assert(got == 50.0)
  }
}

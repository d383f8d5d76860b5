package graft

import java.sql.Timestamp

import graft.streaming.StreamJoins

/** Stream-stream interval join semantics on MemoryStreams: in-band
  * matches emit, out-of-band pairs never do, and the batch twin
  * (TemporalJoins.bandJoin) agrees on the same data.
  */
class StreamJoinsSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("intervalJoin emits exactly the in-band same-key pairs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val lms = MemoryStream[(Long, Timestamp, String)]
    val rms = MemoryStream[(Long, Timestamp, String)]
    val joined = StreamJoins.intervalJoin(
      lms.toDF().toDF("k", "ta", "la"),
      rms.toDF().toDF("k", "tb", "lb"),
      Seq("k"), "ta", "tb", maxGapSec = 600L)
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      lms.addData(
        (1L, ts("2025-01-01 10:00:00"), "a1"),
        (2L, ts("2025-01-01 10:00:00"), "a2"))
      rms.addData(
        (1L, ts("2025-01-01 10:05:00"), "b-in"),     // in band
        (1L, ts("2025-01-01 10:10:00"), "b-edge"),   // exact upper bound
        (1L, ts("2025-01-01 10:00:00"), "b-tie"),    // tie: excluded
        (1L, ts("2025-01-01 10:11:00"), "b-late"),   // beyond band
        (2L, ts("2025-01-01 09:59:00"), "b-before"), // before left
        (3L, ts("2025-01-01 10:05:00"), "b-nokey"))  // no matching key
      q.processAllAvailable()
      val got = spark.table("ij").select("la", "lb")
        .as[(String, String)].collect().toSet
      assert(got == Set("a1" -> "b-in", "a1" -> "b-edge"))
    } finally q.stop()
  }

  test("intervalJoin agrees with the batch bandJoin on the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rnd = new scala.util.Random(3)
    val rows = (1 to 120).map(i => (rnd.nextInt(4).toLong,
      new Timestamp(1704100000000L + rnd.nextInt(7200) * 1000L), i))
    val a = rows.map { case (k, t, i) => (k, t, i) }
    val lms = MemoryStream[(Long, Timestamp, Int)]
    val rms = MemoryStream[(Long, Timestamp, Int)]
    val joined = StreamJoins.intervalJoin(
      lms.toDF().toDF("k", "ta", "ia"),
      rms.toDF().toDF("k", "tb", "ib"),
      Seq("k"), "ta", "tb", maxGapSec = 300L, watermark = "10 hours")
    val q = joined.writeStream.format("memory").queryName("ij2")
      .outputMode("append").start()
    try {
      lms.addData(a)
      rms.addData(a)
      q.processAllAvailable()
      val streamed = spark.table("ij2").select("ia", "ib")
        .as[(Int, Int)].collect().toSet
      val batch = graft.ops.TemporalJoins.bandJoin(
        a.toDF("k", "ta", "ia"), a.toDF("k", "tb", "ib"),
        Seq("k"), "ta", "tb", 300L)
        .select("ia", "ib").as[(Int, Int)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** The streaming form of q_events_sessions: the same native
  * session_window aggregation, fed incrementally with out-of-order
  * batches under a watermark, must produce exactly the batch result
  * once sessions close — the session operator's append-mode contract.
  */
class StreamSessionsSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming session_window aggregation equals batch on the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rnd = new scala.util.Random(29)
    val rows = (1 to 200).map(_ => (rnd.nextInt(6).toLong,
      new Timestamp(1704100000000L + rnd.nextInt(14400) * 1000L),
      rnd.nextInt(500) / 100.0))

    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("sw.start").as("session_start"), col("user_id"),
        col("n_events"), col("sum_value"))

    val ms = MemoryStream[(Long, Timestamp, Double)]
    val q = sessions(
      ms.toDF().toDF("user_id", "ts", "value")
        .withWatermark("ts", "10 hours"))
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // out-of-order delivery across two batches
      val (b1, b2) = rows.splitAt(120)
      ms.addData(b2)
      q.processAllAvailable()
      ms.addData(b1)
      q.processAllAvailable()
      // close every session: a far-future event advances the watermark
      ms.addData((999L, new Timestamp(1704500000000L), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess")
        .filter(col("user_id") =!= 999L)
        .as[(Timestamp, Long, Long, Double)].collect().toSet
      val batch = sessions(rows.toDF("user_id", "ts", "value"))
        .as[(Timestamp, Long, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(streamed.size >= 7) // multiple sessions actually formed
    } finally q.stop()
  }
}

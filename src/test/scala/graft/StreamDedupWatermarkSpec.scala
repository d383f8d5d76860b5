package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** dropDuplicatesWithinWatermark: the built-in bounded-state streaming
  * dedup — keys are remembered only until the watermark passes their
  * event time, so state is O(rate × delay) with no TTL plumbing. The
  * complement to StreamDedup's first-seen-forever semantics (which
  * needs RocksDB + explicit TTL for unbounded key spaces): use this
  * form when duplicates arrive close together (retries, at-least-once
  * sources), the custom one when a key can reappear hours later.
  */
class StreamDedupWatermarkSpec extends SparkTestBase {
  import spark.implicits._

  test("duplicates within the watermark window collapse to one row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[(Long, Timestamp, String)]
    val q = ms.toDF().toDF("k", "ts", "tag")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
      .writeStream.format("memory").queryName("ddww")
      .outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      ms.addData(
        (1L, t("2025-01-01 10:00:00"), "first"),
        (1L, t("2025-01-01 10:00:30"), "retry-same-batch"),
        (2L, t("2025-01-01 10:00:00"), "other-key"))
      q.processAllAvailable()
      ms.addData((1L, t("2025-01-01 10:05:00"), "retry-next-batch"))
      q.processAllAvailable()
      // advance the watermark far past key 1's memory, then repeat it:
      // the key is legitimately new again (bounded state, not
      // first-seen-forever)
      ms.addData((9L, t("2025-01-01 12:00:00"), "advance"))
      q.processAllAvailable()
      ms.addData((1L, t("2025-01-01 12:00:00"), "reappears"))
      q.processAllAvailable()
      val got = spark.table("ddww").select("tag").as[String].collect().toSet
      assert(got == Set("first", "other-key", "advance", "reappears"))
    } finally q.stop()
  }
}

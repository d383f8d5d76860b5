package graft

import java.sql.Timestamp

import graft.streaming.StreamAsOf

/** Streaming as-of enrichment on MemoryStreams: emission is gated on
  * the watermark, the latest-prior semantics match the batch operator
  * on the same data, and tolerance nulls out stale carries.
  */
class StreamAsOfSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOfEnrich emits watermark-final lefts with the latest prior right") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val lms = MemoryStream[(Long, Timestamp, String)]
    val rms = MemoryStream[(Long, Timestamp, Double)]
    val enriched = StreamAsOf.asOfEnrich(
      lms.toDF().toDF("k", "t", "tag"),
      rms.toDF().toDF("k", "rt", "v"),
      Seq("k"), "t", "rt", watermark = "0 seconds")
    val q = enriched.writeStream.format("memory").queryName("asof1")
      .outputMode("append").start()
    try {
      rms.addData(
        (1L, ts("2025-01-01 09:30:00"), 1.0),
        (1L, ts("2025-01-01 10:00:00"), 2.0), // tie with left "b": inclusive
        (1L, ts("2025-01-01 11:00:00"), 9.0)) // future of every left
      lms.addData(
        (1L, ts("2025-01-01 09:45:00"), "a"),
        (1L, ts("2025-01-01 10:00:00"), "b"),
        (1L, null, "null-ts"), // no event-time position: dropped, not a crash
        (2L, ts("2025-01-01 10:00:00"), "no-right"))
      q.processAllAvailable()
      // advance the watermark past every left via a far-future probe
      lms.addData((99L, ts("2025-01-01 23:00:00"), "sentinel"))
      q.processAllAvailable()
      val got = spark.table("asof1")
        .filter(col("tag") =!= "sentinel")
        .select("tag", "v").as[(String, Option[Double])]
        .collect().toMap
      assert(got == Map(
        "a" -> Some(1.0), "b" -> Some(2.0), "no-right" -> None))
    } finally q.stop()
  }

  test("asOfEnrich with tolerance cleans dead state instead of growing it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val lms = MemoryStream[(Long, Timestamp, String)]
    val rms = MemoryStream[(Long, Timestamp, Double)]
    val enriched = StreamAsOf.asOfEnrich(
      lms.toDF().toDF("k", "t", "tag"),
      rms.toDF().toDF("k", "rt", "v"),
      Seq("k"), "t", "rt", watermark = "0 seconds",
      toleranceSec = Some(60L))
    val q = enriched.writeStream.format("memory").queryName("asof_state")
      .outputMode("append").start()
    try {
      // rights on 50 distinct keys that never see a left row
      rms.addData((1L to 50L).map(k => (k, ts("2025-01-01 08:00:00"), 1.0)))
      q.processAllAvailable()
      // advance the watermark far past every carry's expiry
      lms.addData((999L, ts("2025-01-02 00:00:00"), "sentinel"))
      q.processAllAvailable()
      lms.addData((999L, ts("2025-01-03 00:00:00"), "sentinel2"))
      q.processAllAvailable()
      val stateRows = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.apply(0).numRowsTotal)
      // all 50 expired carries evicted; at most the live sentinel key
      assert(stateRows.exists(_ <= 1L),
        s"state not cleaned: $stateRows rows retained")
    } finally q.stop()
  }

  test("asOfEnrich tolerance nulls carries older than the lookback") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val lms = MemoryStream[(Long, Timestamp, String)]
    val rms = MemoryStream[(Long, Timestamp, Double)]
    val enriched = StreamAsOf.asOfEnrich(
      lms.toDF().toDF("k", "t", "tag"),
      rms.toDF().toDF("k", "rt", "v"),
      Seq("k"), "t", "rt", watermark = "0 seconds",
      toleranceSec = Some(3600L))
    val q = enriched.writeStream.format("memory").queryName("asof2")
      .outputMode("append").start()
    try {
      rms.addData((1L, ts("2025-01-01 08:00:00"), 7.0))
      lms.addData(
        (1L, ts("2025-01-01 08:30:00"), "in-tol"),
        (1L, ts("2025-01-01 11:00:00"), "stale"))
      q.processAllAvailable()
      lms.addData((99L, ts("2025-01-01 23:00:00"), "sentinel"))
      q.processAllAvailable()
      val got = spark.table("asof2")
        .filter(col("tag") =!= "sentinel")
        .select("tag", "v").as[(String, Option[Double])]
        .collect().toMap
      assert(got == Map("in-tol" -> Some(7.0), "stale" -> None))
    } finally q.stop()
  }

  test("asOfEnrich agrees with the batch asOfJoin on the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rnd = new scala.util.Random(17)
    val lefts = (1 to 150).map(i => (rnd.nextInt(5).toLong,
      new Timestamp(1704100000000L + rnd.nextInt(7200) * 1000L), i))
    val rights = (1 to 100).map(_ => (rnd.nextInt(5).toLong,
      new Timestamp(1704100000000L + rnd.nextInt(7200) * 1000L),
      rnd.nextInt(1000).toDouble))
    // determinism contract: one right row per (k, rt)
    val rightsAgg = rights.toDF("k", "rt", "v")
      .groupBy("k", "rt").agg(max("v").as("v"))
    val rightRows = rightsAgg.as[(Long, Timestamp, Double)].collect().toSeq

    val lms = MemoryStream[(Long, Timestamp, Int)]
    val rms = MemoryStream[(Long, Timestamp, Double)]
    // generous delay: nothing goes late across the two out-of-order
    // batches, so the final result must equal the batch join exactly
    val enriched = StreamAsOf.asOfEnrich(
      lms.toDF().toDF("k", "t", "id"),
      rms.toDF().toDF("k", "rt", "v"),
      Seq("k"), "t", "rt", watermark = "10 hours")
    val q = enriched.writeStream.format("memory").queryName("asof3")
      .outputMode("append").start()
    try {
      // out-of-order delivery across two batches
      val (l1, l2) = lefts.splitAt(70)
      val (r1, r2) = rightRows.splitAt(40)
      lms.addData(l2); rms.addData(r2)
      q.processAllAvailable()
      lms.addData(l1); rms.addData(r1)
      q.processAllAvailable()
      lms.addData((999L, new Timestamp(1704500000000L), -1))
      q.processAllAvailable()
      val streamed = spark.table("asof3")
        .filter(col("id") =!= -1)
        .select("id", "rt", "v")
        .as[(Int, Option[Timestamp], Option[Double])].collect().toSet
      val batch = graft.ops.TemporalJoins.asOfJoin(
        lefts.toDF("k", "t", "id"), rightsAgg,
        Seq("k"), "t", "rt")
        .select("id", "rt", "v")
        .as[(Int, Option[Timestamp], Option[Double])].collect().toSet
      assert(streamed == batch)
      assert(streamed.exists(_._3.isDefined))
    } finally q.stop()
  }

  test("asOfEnrich rejects non-JSON-round-trippable schemas at plan time") {
    import spark.implicits._
    val ts = new Timestamp(1704067200000L)
    val okLeft = Seq((1, ts, "x")).toDF("k", "t", "v")
    // map with non-string keys: JSON object keys are strings
    val mapRight = Seq((1, ts, Map(1 -> "a"))).toDF("k", "rt", "m")
    val eM = intercept[IllegalArgumentException] {
      StreamAsOf.asOfEnrich(okLeft, mapRight, Seq("k"), "t", "rt")
    }
    assert(eM.getMessage.contains("keys"))
    // a non-string-keyed map nested inside a struct is caught too
    val nested = Seq((1, ts, (1, Map(2L -> "b")))).toDF("k", "rt", "s")
    val eN = intercept[IllegalArgumentException] {
      StreamAsOf.asOfEnrich(okLeft, nested, Seq("k"), "t", "rt")
    }
    assert(eN.getMessage.contains("s._2"))
  }

  test("asOfEnrich round-trips binary payloads through the JSON state") {
    // multimodal rows carry blobs as binary columns; to_json base64-
    // encodes BinaryType and from_json decodes it back, so the operator
    // must accept and faithfully carry binary on both sides
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val lms = MemoryStream[(Long, Timestamp, Array[Byte])]
    val rms = MemoryStream[(Long, Timestamp, Array[Byte])]
    val enriched = StreamAsOf.asOfEnrich(
      lms.toDF().toDF("k", "t", "lblob"),
      rms.toDF().toDF("k", "rt", "rblob"),
      Seq("k"), "t", "rt", watermark = "0 seconds")
    val q = enriched.writeStream.format("memory").queryName("asof_bin")
      .outputMode("append").start()
    try {
      rms.addData((1L, ts("2025-01-01 09:00:00"), Array[Byte](1, 2, 3)))
      lms.addData((1L, ts("2025-01-01 09:30:00"), Array[Byte](9, 8)))
      q.processAllAvailable()
      lms.addData((99L, ts("2025-01-01 23:00:00"), Array[Byte](0)))
      q.processAllAvailable()
      val got = spark.table("asof_bin")
        .filter(col("k") === 1L)
        .select("lblob", "rblob")
        .as[(Array[Byte], Array[Byte])].collect()
      assert(got.length == 1)
      assert(got(0)._1.toSeq == Seq[Byte](9, 8))
      assert(got(0)._2.toSeq == Seq[Byte](1, 2, 3))
    } finally q.stop()
  }
}

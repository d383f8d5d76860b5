package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{DriftMonitor, TableStore}
import graft.text.Drift

class DriftMonitorSpec extends SparkTestBase {
  import spark.implicits._

  private def newStore(tag: String): TableStore =
    new TableStore(Files.createTempDirectory(s"graft_dm_$tag").toString)

  private val english = Seq(
    "the cat sat on the mat", "the dog ate the fish",
    "a cat and a dog", "the fish swam home")
  private val german = Seq(
    "der hund ist ein tier", "die katze und der fisch",
    "ein tier ist da", "der fisch schwimmt")

  test("a distribution flip scores far above a same-language batch") {
    val store = newStore("flip")
    val fold = DriftMonitor.foldBatch(store, "docs", col("text"), 256) _
    fold(english.toDF("text"), 0L)
    fold(english.map(t => t + " again").toDF("text"), 1L) // mild shift
    fold(german.toDF("text"), 2L)                          // language flip
    val log = DriftMonitor.log(spark, store, "docs")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(log.keySet == Set("0", "1", "2"))
    assert(log("2") > log("1") * 2,
      s"language flip not separated: $log")
  }

  test("driver-side scoring equals the batch operator on the same split") {
    // batch 1 scored against batch 0's reference must equal
    // Drift.jsDivergence(batch0, batch1) — the two code paths share
    // formula, smoothing, and rounding
    val store = newStore("eq")
    val fold = DriftMonitor.foldBatch(store, "docs", col("text"), 256) _
    fold(english.toDF("text"), 0L)
    fold(german.toDF("text"), 1L)
    val logged = DriftMonitor.log(spark, store, "docs")
      .filter(col("batch_id") === "1").select("js").as[Double].head()
    val direct = Drift.jsDivergence(
      english.toDF("text"), german.toDF("text"), col("text"), 256)
    assert(logged == direct, s"monitor $logged != operator $direct")
  }

  test("replayed batch is a no-op; reference accumulates exactly once") {
    val store = newStore("replay")
    val fold = DriftMonitor.foldBatch(store, "docs", col("text"), 256) _
    fold(english.toDF("text"), 0L)
    fold(german.toDF("text"), 1L)
    val vRef = store.currentVersion("docs_ref")
    fold(german.toDF("text"), 1L) // crash redelivery
    fold(english.toDF("text"), 0L) // stale id
    assert(store.currentVersion("docs_ref") == vRef)
    assert(DriftMonitor.log(spark, store, "docs").count() == 2)
    // reference = exact counts of both batches folded once
    val refTotal = store
      .read(spark, "docs_ref", DriftMonitor.refSchema)
      .agg(sum("c")).as[Long].head()
    val want = graft.text.Dsir.bucketCounts(
        (english ++ german).toDF("text"), col("text"), 256)
      .agg(sum("c")).as[Long].head()
    assert(refTotal == want)
  }

  test("streaming end-to-end through start()") {
    val store = newStore("stream")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val cp = Files.createTempDirectory("graft_dm_cp").toString
    val query = DriftMonitor.start(
      mem.toDF().toDF("text"), store, "docs", col("text"), 256, cp)
    try {
      mem.addData(english: _*)
      query.processAllAvailable()
      mem.addData(german: _*)
      query.processAllAvailable()
    } finally query.stop()
    val log = DriftMonitor.log(spark, store, "docs")
      .orderBy("batch_id").select("js").as[Double].collect()
    assert(log.length == 2)
    assert(log(1) > 0.0)
  }
}

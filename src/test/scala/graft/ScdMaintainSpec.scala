package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Scd
import graft.streaming.{ScdMaintain, TableStore}

/** The streaming SCD2 loop: update stream → per-batch collapse →
  * exactly-once scd2Merge fold into the TableStore → point-in-time
  * reads answer from the maintained history.
  */
class ScdMaintainSpec extends SparkTestBase {
  import spark.implicits._

  private def newStore(tag: String): TableStore =
    new TableStore(Files.createTempDirectory(s"graft_scdm_$tag").toString)

  private def batchDf(rows: (Long, Long, Double, String)*) =
    rows.toDF("k", "seq", "bal", "seg")

  private val timeOf: Long => org.apache.spark.sql.Column =
    id => lit(f"t$id%04d") // deterministic, monotone in batch id

  private def histSchema = ScdMaintain.historySchema(
    batchDf((1L, 1L, 0.0, "")).drop("seq").schema,
    org.apache.spark.sql.types.StringType)

  test("folded batches layer versions; snapshotAt answers any past time") {
    val store = newStore("fold")
    val fold = ScdMaintain.foldBatch(store, "dim", "k", "seq", timeOf) _
    fold(batchDf((1L, 1L, 1.0, "A"), (2L, 1L, 5.0, "B")), 0L)
    fold(batchDf((1L, 2L, 2.0, "A")), 1L)           // k=1 changes
    fold(batchDf((2L, 3L, 5.0, "B")), 2L)           // no-op for k=2
    val hist = store.read(spark, "dim", histSchema)
    // k=1 has two versions, k=2 one (the no-op batch spawned nothing)
    assert(hist.count() == 3)
    assert(hist.filter(col("is_current")).count() == 2)
    val at0 = Scd.snapshotAt(hist, lit("t0000"))
      .select("k", "bal").as[(Long, Double)].collect().toSet
    val at9 = Scd.snapshotAt(hist, lit("t9999"))
      .select("k", "bal").as[(Long, Double)].collect().toSet
    assert(at0 == Set((1L, 1.0), (2L, 5.0)))
    assert(at9 == Set((1L, 2.0), (2L, 5.0)))
  }

  test("in-batch collapse keeps the greatest (seq, attrs) row per key") {
    val store = newStore("collapse")
    ScdMaintain.foldBatch(store, "dim", "k", "seq", timeOf)(
      batchDf((1L, 3L, 30.0, "C"), (1L, 1L, 10.0, "A"), (1L, 2L, 20.0, "B")),
      0L)
    val hist = store.read(spark, "dim", histSchema)
    val row = hist.select("bal", "seg").as[(Double, String)].collect().toSeq
    assert(row == Seq((30.0, "C")), s"collapse picked $row")
  }

  test("a replayed batch id is a no-op (exactly-once under redelivery)") {
    val store = newStore("replay")
    val fold = ScdMaintain.foldBatch(store, "dim", "k", "seq", timeOf) _
    fold(batchDf((1L, 1L, 1.0, "A")), 0L)
    fold(batchDf((1L, 2L, 2.0, "A")), 1L)
    val vBefore = store.currentVersion("dim")
    fold(batchDf((1L, 2L, 2.0, "A")), 1L)   // crash redelivery
    fold(batchDf((1L, 9L, 99.0, "X")), 0L)  // stale id, corrupt content
    assert(store.currentVersion("dim") == vBefore,
      "replayed batch produced a new version")
    val hist = store.read(spark, "dim", histSchema)
    assert(hist.count() == 2 &&
      hist.filter(col("is_current")).select("bal").as[Double].head() == 2.0)
  }

  test("streaming end-to-end: MemoryStream batches fold through start()") {
    val store = newStore("stream")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, String)]
    val cp = Files.createTempDirectory("graft_scdm_cp").toString
    val query = ScdMaintain.start(
      mem.toDF().toDF("k", "seq", "bal", "seg"),
      store, "dim", "k", "seq", timeOf, cp)
    try {
      mem.addData((1L, 1L, 1.0, "A"), (2L, 1L, 5.0, "B"))
      query.processAllAvailable()
      mem.addData((1L, 2L, 2.0, "A"))
      query.processAllAvailable()
    } finally query.stop()
    val hist = store.read(spark, "dim", histSchema)
    assert(hist.count() == 3)
    val open = hist.filter(col("is_current"))
      .select("k", "bal").as[(Long, Double)].collect().toSet
    assert(open == Set((1L, 2.0), (2L, 5.0)))
    // the closed k=1 v1 interval is [t of batch 0, t of batch 1)
    val closed = hist.filter(!col("is_current"))
      .select("valid_from", "valid_to").as[(String, String)].head()
    assert(closed._1 < closed._2)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.AggMaintain
import graft.plans.MvRewrite
import graft.streaming.{MvMaintain, TableStore}

/** The full MV loop: stream → per-batch partial → exactly-once fold
  * into the TableStore → MvRewrite serves the aggregate from the
  * maintained snapshot.
  */
class MvMaintainSpec extends SparkTestBase {
  import spark.implicits._

  private def newStore(tag: String): TableStore =
    new TableStore(
      Files.createTempDirectory(s"graft_mvm_$tag").toString)

  private val keys = Seq("g")
  private def batchDf(rows: (String, Double)*) =
    rows.toDF("g", "v")

  test("folded batches equal the one-shot aggregate; finish() agrees") {
    val store = newStore("fold")
    val b0 = batchDf("a" -> 1.0, "a" -> 2.0, "b" -> 5.0)
    val b1 = batchDf("a" -> 4.0, "c" -> 7.0)
    val b2 = batchDf("b" -> 0.5, "c" -> 7.0, "c" -> 1.0)
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      MvMaintain.foldBatch(store, "state", keys, "v")(b, i.toLong)
    }
    val schema = MvMaintain.stateSchema(b0.schema, keys, "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val folded = rows(AggMaintain.finish(
      store.read(spark, "state", schema)))
    val oneShot = rows(AggMaintain.finish(AggMaintain.partial(
      b0.unionByName(b1).unionByName(b2), keys, "v")))
    assert(folded == oneShot,
      s"incremental fold diverged from one-shot: $folded vs $oneShot")
  }

  test("a replayed batch id is a no-op (exactly-once under redelivery)") {
    val store = newStore("replay")
    MvMaintain.foldBatch(store, "state", keys, "v")(
      batchDf("a" -> 1.0), 0L)
    MvMaintain.foldBatch(store, "state", keys, "v")(
      batchDf("a" -> 10.0), 1L)
    val vBefore = store.currentVersion("state")
    // crash-before-checkpoint redelivery: same id, same (or corrupted)
    // content — must not double-count
    MvMaintain.foldBatch(store, "state", keys, "v")(
      batchDf("a" -> 10.0), 1L)
    MvMaintain.foldBatch(store, "state", keys, "v")(
      batchDf("a" -> 999.0), 0L)
    assert(store.currentVersion("state") == vBefore,
      "replayed batch produced a new version")
    val schema = MvMaintain.stateSchema(
      batchDf("a" -> 1.0).schema, keys, "v")
    val row = store.read(spark, "state", schema).collect().head
    assert(row.getLong(1) == 2L && row.getDouble(3) == 1.0 &&
      row.getDouble(4) == 10.0)
  }

  test("streaming end-to-end: MemoryStream batches fold through start()") {
    val store = newStore("stream")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val cp = Files.createTempDirectory("graft_mvm_cp").toString
    val query = MvMaintain.start(
      mem.toDF().toDF("g", "v"), store, "state", keys, "v", cp)
    try {
      mem.addData(("a", 1.0), ("b", 2.0))
      query.processAllAvailable()
      mem.addData(("a", 3.0))
      query.processAllAvailable()
    } finally query.stop()
    val schema = MvMaintain.stateSchema(
      batchDf("a" -> 1.0).schema, keys, "v")
    val got = store.read(spark, "state", schema)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }

  test("MvRewrite serves the aggregate from the maintained snapshot") {
    val store = newStore("serve")
    val factPath = Files.createTempDirectory("graft_mvm_fact").toString
    val fact = batchDf("a" -> 1.0, "a" -> 2.0, "b" -> 5.0, "b" -> 3.0)
    fact.write.mode("overwrite").parquet(factPath)
    // maintain from two disjoint batches of the same fact rows
    val parts = Seq(
      batchDf("a" -> 1.0, "b" -> 5.0), batchDf("a" -> 2.0, "b" -> 3.0))
    parts.zipWithIndex.foreach { case (b, i) =>
      MvMaintain.foldBatch(store, "state", keys, "v")(b, i.toLong)
    }
    val statePath = store.currentVersionPath("state").get
    MvRewrite.register(spark, factPath, keys, "v", statePath,
      acceptTwoDecimalRounding = true)
    val agg = spark.read.parquet(factPath)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val scans = agg.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
    }.flatten
    assert(scans.exists(_.contains("graft_mvm_")) &&
      !scans.exists(_.contains("graft_mvm_fact")),
      s"rewrite did not serve from the maintained state: $scans")
    val got = agg.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map("a" -> ((2L, 3.0)), "b" -> ((2L, 8.0))))
    MvRewrite.unregister(factPath)
  }
}

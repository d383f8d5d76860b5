package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.ops.Layout

/** Z-order layout must buy row-group skipping on EVERY interleaved
  * dimension — the capability a single-key sort can't provide
  * (LayoutSkippingSpec pins that half). Plus unit pins on the bin
  * fold and the bit interleave, and content preservation.
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("interleave places column j's bit b at position b*n + j") {
    // bins x=0b101, y=0b011 at bits=3 → z bits (msb..lsb per level):
    // level2: y=0,x=1; level1: y=1,x=0; level0: y=1,x=1
    // z = x0·2⁰ + y0·2¹ + x1·2² + y1·2³ + x2·2⁴ + y2·2⁵
    //   = 1 + 2 + 0 + 8 + 16 + 0 = 27
    val got = Seq((5, 3)).toDF("x", "y")
      .select(Layout.interleave(Seq(col("x"), col("y")), 3).as("z"))
      .head().getLong(0)
    assert(got == 27L, s"interleave(0b101, 0b011) should be 27, got $got")
  }

  test("binOf counts boundaries at or below the value, nulls to bin 0") {
    val bounds = Array(10.0, 20.0, 30.0)
    val got = Seq(Some(5.0), Some(10.0), Some(25.0), Some(99.0), None)
      .toDF("x")
      .select(Layout.binOf(col("x"), bounds).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 1, 2, 3, 0), s"bin fold broke: $got")
  }

  test("z-order compaction folds a store table to one curve-ordered version") {
    import org.apache.spark.sql.types._
    val store = new graft.streaming.TableStore(
      Files.createTempDirectory("zorder_store").toString)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("x", LongType), StructField("y", LongType),
      StructField("epoch", StringType)))
    val n = 20000
    // three epoch-partition writes — the incremental-ingest read
    // fan-out (one live version per epoch, the CorpusIngest shape)
    (0 until 3).foreach { v =>
      val part = ((v * n / 3) until ((v + 1) * n / 3)).map(i =>
        (i.toLong, (i % 100).toLong, ((i.toLong * 2654435761L) % 997L),
          v.toString))
      store.overwritePartitions("t", part.toDF("id", "x", "y", "epoch"),
        "epoch", Seq(v.toString))
    }
    assert(store.liveVersionCount("t") == 3)
    val before = store.read(spark, "t", schema).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sorted.toSeq
    Layout.compactZOrdered(spark, store, "t", schema, Seq("x", "y"),
      bits = 4, numFiles = 4)
    assert(store.liveVersionCount("t") == 1,
      "compaction must fold the read fan-out to one version")
    val after = store.read(spark, "t", schema).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sorted.toSeq
    assert(after == before, "layout compaction changed table contents")
  }

  test("an all-NULL column degrades to bin 0 instead of failing the write") {
    val dir = Files.createTempDirectory("graft_zorder_null").toString
    try {
      val df = Seq((1L, Option.empty[Double], 5.0),
        (2L, Option.empty[Double], 3.0)).toDF("id", "x", "y")
      Layout.writeZOrdered(df, s"$dir/t", Seq("x", "y"), bits = 2,
        numFiles = 1)
      assert(spark.read.parquet(s"$dir/t").count() == 2L)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  private def scanOutputRows(
      df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val resultRows = df.collect().length.toLong
    def leafScan(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => leafScan(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(leafScan)
      }
    val scanned = leafScan(df.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
    (resultRows, scanned)
  }

  test("z-order skips row groups on BOTH dimensions; single-key sort " +
      "only on its own") {
    val dir = Files.createTempDirectory("graft_zorder").toString
    val n = 200000
    // two independent uniform dimensions: x cycles i mod 1000, y is a
    // Knuth multiplicative hash of i (NOT of x — (i*7919)%1000 would
    // be a pure function of x and the test would prove nothing); the
    // payload gives rows realistic width, so a 64 KB row group holds
    // FEWER rows than one 16×16 z-bin — at that grain the read
    // fraction tracks the slice fraction instead of the bin period
    val rows = (0 until n).map(i =>
      (i.toLong, (i % 1000).toLong,
        ((i.toLong * 2654435761L) % 1000000007L) % 1000L,
        s"payload_${i}_" + "x" * 80))
    try {
      val df = rows.toDF("id", "x", "y", "payload")
      Layout.writeZOrdered(df, s"$dir/zorder", Seq("x", "y"),
        bits = 4, numFiles = 4, rowGroupBytes = Some(64L * 1024))
      df.orderBy("x").coalesce(4)
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(s"$dir/xsorted")

      val zord = spark.read.parquet(s"$dir/zorder")
      val xsort = spark.read.parquet(s"$dir/xsorted")

      // content preserved (multiset — z-order only reorders)
      assert(zord.groupBy("id").count().filter(col("count") =!= 1).isEmpty,
        "z-order write duplicated or dropped ids")
      assert(zord.count() == n.toLong)

      val xPred = col("x").between(100, 160)   // ~1/16 of the x range
      val yPred = col("y").between(500, 560)

      val (xRowsZ, xReadZ) = scanOutputRows(zord.filter(xPred))
      val (yRowsZ, yReadZ) = scanOutputRows(zord.filter(yPred))
      val (xRowsS, xReadS) = scanOutputRows(xsort.filter(xPred))
      val (yRowsS, yReadS) = scanOutputRows(xsort.filter(yPred))

      // identical answers on both layouts
      assert(xRowsZ == xRowsS && yRowsZ == yRowsS)

      // the x-sorted layout skips on x...
      assert(xReadS < n / 4,
        s"x-sorted layout did not skip on x: $xReadS of $n")
      // ...but reads (essentially) everything for a y filter — row
      // groups span the whole y range, modulo one lucky tail group
      assert(yReadS > n * 9L / 10,
        s"x-sorted layout unexpectedly skipped on y: $yReadS")
      // the z-ordered layout skips on BOTH dimensions
      assert(xReadZ < n / 4,
        s"z-order did not skip on x: $xReadZ of $n")
      assert(yReadZ < n / 4,
        s"z-order did not skip on y: $yReadZ of $n")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}

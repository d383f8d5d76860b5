package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR (default sf0.1), local[32].
  *
  * Prints ONE JSON line and also writes it to a file
  * (SPARK_GRAFT_BENCH_OUT, default ./BENCH_OUT.json) so the driver
  * never has to fish the line out of the sbt log stream. A failing
  * query FAILS the run (non-zero exit) — round 1 recorded broken
  * queries as fast successes.
  *
  * Optional args: query names to run (subset, for local iteration).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // untimed warmup: session/codegen/shuffle-machinery startup AND the
    // cold first read of every sf-dir table (OS page cache + parquet
    // footers) must not be billed to whichever query runs first — round
    // 2 billed the cold sf0.1 read to q1, the alphabetical leader
    spark.range(1000).selectExpr("sum(id)").count()
    SparkEntry.entry(spark).count()
    // noop-write, not count(): count() compiles to a metadata-only
    // parquet scan that never touches the heavy text/embedding columns,
    // so the first text query was still billed ~2.5 s of cold column
    // read (round 3 billed it to q_dedup_corpus, the alphabetical
    // leader among text queries)
    Tables.all.foreach(n =>
      Tables.loaders(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save())
    SparkEntry.warmFixtures(spark, sfDir) // one-time fixtures, untimed
    // JMH-style JVM warmup: run every benched query once at the tiny
    // warm dir, untimed. Spark's codegen cache keys on generated-code
    // TEXT (paths live in scan metadata, not the generated class), so
    // this pre-compiles ~all generated operators for the timed loop —
    // round 3 billed ~3 s of one-time Janino+C2 compilation to
    // whichever query first touched each pipeline family.
    val warmDir = sys.env.getOrElse(
      "SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (warmDir != sfDir && Files.isDirectory(Paths.get(warmDir))) {
      SparkEntry.warmFixtures(spark, warmDir)
      names.foreach { n =>
        SparkEntry.queries(n)(spark, warmDir).count()
        spark.catalog.clearCache()
      }
    }
    spark.catalog.clearCache()
    System.gc()
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // queries persist intermediate signature tables; drop them so
      // timings stay independent, and nudge GC so one query's garbage
      // is not billed to the next
      spark.catalog.clearCache()
      System.gc()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // also on stderr and in a known file: the driver's log-fishing
    // parser gets two sbt-prefix-free escape hatches
    System.err.println(json)
    Files.writeString(Paths.get(out), json + "\n")
    spark.stop()
  }
}

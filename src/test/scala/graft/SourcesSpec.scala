package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.types._

import graft.sources.FileDiscovery

class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("loadCsv: explicit schema, header, quoted strings round-trip (S1)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val df = Seq((1, "plain", 2), (2, "has, comma", 3), (3, "has \"quote\"", 4))
      .toDF("id", "name", "k")
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/t")
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("k", IntegerType)))
    val got = Tables.loadCsv(spark, s"$dir/t", schema)
      .as[(Int, String, Int)].collect().toSet
    assert(got == Set((1, "plain", 2), (2, "has, comma", 3), (3, "has \"quote\"", 4)))
  }

  test("loadCsv over a directory unions all part files (S8)") {
    val dir = Files.createTempDirectory("graft-csv-union").toString
    val df = spark.range(100).select($"id".cast("int").as("id"))
    df.repartition(4).write.mode("overwrite").option("header", "true").csv(s"$dir/t")
    val parts = Files.list(Paths.get(s"$dir/t")).toArray
      .map(_.toString).count(_.endsWith(".csv"))
    assert(parts >= 2, "fixture must span multiple files")
    val schema = StructType(Seq(StructField("id", IntegerType)))
    val got = Tables.loadCsv(spark, s"$dir/t", schema).as[Int].collect().sorted
    assert(got.toSeq == (0 until 100))
  }

  test("modifiedSince keeps only files inside the mtime window (S9)") {
    val dir = Files.createTempDirectory("graft-mtime").toString
    val old = Paths.get(dir, "old.csv")
    val fresh = Paths.get(dir, "fresh.csv")
    Files.writeString(old, "a\n1\n")
    Files.writeString(fresh, "a\n2\n")
    val cutoff = System.currentTimeMillis() - 3600 * 1000L
    Files.setLastModifiedTime(old, FileTime.fromMillis(cutoff - 7200 * 1000L))
    val got = FileDiscovery.modifiedSince(spark, dir, cutoff)
    assert(got.map(p => p.substring(p.lastIndexOf('/') + 1)) == Seq("fresh.csv"))
    assert(FileDiscovery.modifiedSince(spark, s"$dir/missing", cutoff).isEmpty)
  }
}

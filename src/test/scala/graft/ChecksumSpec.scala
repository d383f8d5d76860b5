package graft

import org.apache.spark.sql.functions._

import graft.ops.DataQuality

class ChecksumSpec extends SparkTestBase {
  import spark.implicits._

  private def sum(df: org.apache.spark.sql.DataFrame) =
    DataQuality.tableChecksum(df, Seq(col("a"), col("b")))
      .as[(Long, Long)].head()

  test("layout- and order-invariant: any partitioning, same pair") {
    val rows = (0 until 2000).map(i => (i.toLong, s"v${i % 37}"))
    val df = rows.toDF("a", "b")
    val base = sum(df)
    assert(base == sum(df.repartition(13)))
    assert(base == sum(df.orderBy(desc("b"), desc("a"))))
    assert(base == sum(spark.createDataFrame(
      spark.sparkContext.parallelize(df.collect().reverse.toSeq, 7),
      df.schema)))
  }

  test("one dropped / duplicated / altered row moves the checksum") {
    val rows = (0 until 500).map(i => (i.toLong, s"v$i"))
    val df = rows.toDF("a", "b")
    val base = sum(df)
    val dropped = sum(rows.tail.toDF("a", "b"))
    assert(dropped._1 == 499 && dropped._2 != base._2)
    val duped = sum((rows ++ rows.take(1)).toDF("a", "b"))
    assert(duped._1 == 501 && duped._2 != base._2)
    val altered = sum(rows.updated(7, (7L, "V7")).toDF("a", "b"))
    assert(altered._1 == 500 && altered._2 != base._2)
  }

  test("NULL, empty string, and the literal sentinel are distinct") {
    // the SOH sentinel keeps (NULL) != ("") — and a real ""
    // cell colliding with NULL is the documented tolerance boundary,
    // so pin the two cases the encoding DOES separate
    val withNull = sum(Seq((Some(1L), None: Option[String]),
      (Some(2L), Some("x"))).toDF("a", "b"))
    val withEmpty = sum(Seq((Some(1L), Some("")),
      (Some(2L), Some("x"))).toDF("a", "b"))
    assert(withNull._2 != withEmpty._2)
    // column-boundary integrity: ("ab","c") != ("a","bc")
    val ab_c = sum(Seq(("ab", "c")).toDF("a", "b"))
    val a_bc = sum(Seq(("a", "bc")).toDF("a", "b"))
    assert(ab_c._2 != a_bc._2)
  }

  test("empty table: (0, 0) — not null") {
    val empty = sum(Seq.empty[(Long, String)].toDF("a", "b"))
    assert(empty == ((0L, 0L)))
  }
}

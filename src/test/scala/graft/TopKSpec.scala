package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TopK

/** Bounded-heap per-group top-k: must agree row-for-row with the
  * window row_number() form on a total ordering, bound state at k,
  * and aggregate via ObjectHashAggregate partials (no window sort).
  */
class TopKSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 5.0, 1L), ("a", 9.0, 2L), ("a", 9.0, 3L), ("a", 1.0, 4L),
    ("b", 2.0, 5L), ("b", 3.0, 6L),
    ("c", 7.0, 7L)).toDF("g", "v", "id")

  test("largest: matches window row_number on (v desc, id desc)") {
    val got = TopK.topKPerGroup(df, Seq("g"),
        struct(col("v"), col("id")), k = 2, largest = true)
      .select("g", "rank", "v", "id")
      .as[(String, Int, Double, Long)].collect().toSet
    val want = df.withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id").desc)))
      .filter(col("rank") <= 2)
      .select("g", "rank", "v", "id")
      .as[(String, Int, Double, Long)].collect().toSet
    assert(got == want)
    // tie on v=9.0 within group a resolved by id: id=3 outranks id=2
    assert(got.contains(("a", 1, 9.0, 3L)) && got.contains(("a", 2, 9.0, 2L)))
  }

  test("smallest: matches window row_number on (v asc, id asc)") {
    val got = TopK.topKPerGroup(df, Seq("g"),
        struct(col("v"), col("id")), k = 2, largest = false)
      .select("g", "rank", "v", "id")
      .as[(String, Int, Double, Long)].collect().toSet
    val want = df.withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("v"), col("id"))))
      .filter(col("rank") <= 2)
      .select("g", "rank", "v", "id")
      .as[(String, Int, Double, Long)].collect().toSet
    assert(got == want)
  }

  test("groups smaller than k emit all their rows") {
    val got = TopK.topKPerGroup(df, Seq("g"),
      struct(col("v"), col("id")), k = 5, largest = true)
    assert(got.count() == df.count())
  }

  test("randomized: equals the window form on 2k rows, skewed groups") {
    val n = 2000
    val rnd = df.sparkSession.range(n.toLong).select(
      pmod(xxhash64(col("id")), lit(7)).cast("string").as("g"),
      (pmod(xxhash64(col("id"), lit(1)), lit(50)) / 10.0).as("v"),
      col("id"))
    val got = TopK.topKPerGroup(rnd, Seq("g"),
        struct(col("v"), col("id")), k = 3, largest = true)
      .select("g", "rank", "v", "id")
      .as[(String, Int, Double, Long)].collect().toSet
    val want = rnd.withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id").desc)))
      .filter(col("rank") <= 3)
      .select("g", "rank", "v", "id")
      .as[(String, Int, Double, Long)].collect().toSet
    assert(got == want)
  }

  test("plan: ObjectHashAggregate partial/final pair, no window sort") {
    val plan = TopK.topKPerGroup(df, Seq("g"),
        struct(col("v"), col("id")), k = 2, largest = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.contains("Window"))
  }
}

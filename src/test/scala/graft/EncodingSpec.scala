package graft

import org.apache.spark.sql.functions._

import graft.ops.Encoding

class EncodingSpec extends SparkTestBase {
  import spark.implicits._

  test("looTargetEncode: each row's own target excluded; singletons null") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 5L)).toDF("g", "id", "y")
    val got = Encoding.looTargetEncode(df, col("g"), col("y"), "loo")
      .select("id", "loo").as[(Long, Option[Double])].collect().toMap
    // group a total 60: (60-10)/2=25, (60-20)/2=20, (60-30)/2=15
    assert(got == Map(1L -> Some(25.0), 2L -> Some(20.0),
      3L -> Some(15.0), 4L -> None))
  }

  test("looTargetEncode: passthrough columns survive; layout-independent") {
    val df = (1 to 300)
      .map(i => (s"g${i % 5}", i.toLong, ((i * 37) % 100).toLong))
      .toDF("g", "id", "y")
    val a = Encoding.looTargetEncode(df, col("g"), col("y"), "loo")
    assert(a.columns.toSeq == Seq("g", "id", "y", "loo"))
    val b = Encoding.looTargetEncode(
      df.repartition(13), col("g"), col("y"), "loo")
    assert(a.select("id", "loo").as[(Long, Double)].collect().toSet ==
      b.select("id", "loo").as[(Long, Double)].collect().toSet)
  }

  test("quantileBins: quartiles of 1..8 split 2/2/2/2") {
    val df = (1 to 8).map(v => ("a", v.toLong)).toDF("g", "v")
    val got = Encoding.quantileBins(df, col("g"), col("v"), 4, "bin")
      .select("v", "bin").as[(Long, Int)].collect().toMap
    // thresholds (inclusive defn): q25=2, q50=4, q75=6
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2,
      5L -> 3, 6L -> 3, 7L -> 4, 8L -> 4))
  }

  test("quantileBins: constant group collapses to bin 1") {
    val df = (1 to 6).map(_ => ("c", 7L)).toDF("g", "v")
    val bins = Encoding.quantileBins(df, col("g"), col("v"), 4, "bin")
      .select("bin").as[Int].collect().toSet
    assert(bins == Set(1))
  }

  test("quantileBins: per-group thresholds are independent") {
    val df = ((1 to 8).map(v => ("lo", v.toLong)) ++
      (1 to 8).map(v => ("hi", v * 1000L))).toDF("g", "v")
    val got = Encoding.quantileBins(df, col("g"), col("v"), 2, "bin")
      .select("g", "v", "bin").as[(String, Long, Int)].collect()
    // median of each group is its own 4th value
    assert(got.filter(_._1 == "lo").forall(r =>
      r._3 == (if (r._2 <= 4L) 1 else 2)))
    assert(got.filter(_._1 == "hi").forall(r =>
      r._3 == (if (r._2 <= 4000L) 1 else 2)))
  }
}

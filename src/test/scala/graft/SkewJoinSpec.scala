package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin equals the plain equi-join on skewed data") {
    // 90% of probe rows share one hot key
    val big = (1 to 2000).map(i =>
      (i.toLong, if (i % 10 == 0) i.toLong % 7 else 1L))
      .toDF("row_id", "k")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (42L, "unmatched"))
      .toDF("k", "name")
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), 16,
        saltSource = col("row_id"))
      .select("row_id", "k", "name").as[(Long, Long, String)]
      .collect().toSet
    val plain = big.join(small, Seq("k"))
      .select("row_id", "k", "name").as[(Long, Long, String)]
      .collect().toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("saltedJoin actually fans a hot key across salts") {
    val big = (1 to 1000).map(i => (i.toLong, 1L)).toDF("row_id", "k")
    val probe = big.withColumn(
      "_salt", pmod(xxhash64(col("row_id")), lit(16)))
    val distinctSalts = probe.select("_salt").distinct().count()
    // xxhash64 over 1000 distinct ids hits all 16 buckets w.h.p.
    assert(distinctSalts == 16L)
  }

  test("saltedJoin rejects the reserved column name") {
    val df = Seq((1L, 2L)).toDF("k", "_salt")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(df, df.select("k"), Seq("k"), 4, col("k"))
    }
  }
}

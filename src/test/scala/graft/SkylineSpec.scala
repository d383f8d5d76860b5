package graft

import org.apache.spark.sql.functions._

import graft.ops.Skyline

class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force dominance reference (minimize x, maximize y). */
  private def brute(pts: Seq[(Long, Double, Double)]
      ): Set[(Long, Double, Double)] =
    pts.filter { case (_, px, py) =>
      !pts.exists { case (_, qx, qy) =>
        qx <= px && qy >= py && (qx < px || qy > py)
      }
    }.toSet

  test("skyline2d on hand-checked points, ties kept, dominated dropped") {
    // (id, price, size): 1 and 2 tie exactly; 3 dominated by 1;
    // 4 cheaper but smaller (frontier); 5 biggest but priciest
    // (frontier); 6 dominated by 5 (same size, pricier)
    val pts = Seq(
      (1L, 10.0, 5.0), (2L, 10.0, 5.0), (3L, 11.0, 5.0),
      (4L, 8.0, 3.0), (5L, 20.0, 9.0), (6L, 21.0, 9.0))
      .toDF("id", "price", "size")
    val got = Skyline.skyline2d(pts, col("price"), col("size"))
      .as[(Long, Double, Double)].collect().toSet
    assert(got == Set((1L, 10.0, 5.0), (2L, 10.0, 5.0),
      (4L, 8.0, 3.0), (5L, 20.0, 9.0)))
  }

  test("skyline2d matches brute-force dominance on random points") {
    val pts = (0 until 500).map { i =>
      (i.toLong, ((i * 73 + 11) % 97).toDouble,
        ((i * 131 + 7) % 89).toDouble)
    }
    val df = pts.toDF("id", "x", "y")
    val got = Skyline.skyline2d(df, col("x"), col("y"))
      .as[(Long, Double, Double)].collect().toSet
    assert(got == brute(pts))
    // layout independence + banding independence (bands is execution
    // partitioning only — 1 band degenerates to one global class walk)
    val re = Skyline.skyline2d(df.repartition(7), col("x"), col("y"),
      bands = 1).as[(Long, Double, Double)].collect().toSet
    assert(re == got)
    val re3 = Skyline.skyline2d(df, col("x"), col("y"), bands = 3)
      .as[(Long, Double, Double)].collect().toSet
    assert(re3 == got)
  }

  test("orientation flags flip the frontier; nulls are excluded") {
    val pts = Seq(
      (1L, Some(1.0), Some(1.0)), (2L, Some(2.0), Some(2.0)),
      (3L, Some(3.0), Some(3.0)),
      (4L, None, Some(9.0)), (5L, Some(0.0), None))
      .toDF("id", "x", "y")
    // maximize x, maximize y: only (3,3) survives
    val got = Skyline.skyline2d(pts, col("x"), col("y"),
      minimizeX = false, maximizeY = true)
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L))
    // minimize both: only (1,1)
    val got2 = Skyline.skyline2d(pts, col("x"), col("y"),
      minimizeX = true, maximizeY = false)
      .select("id").as[Long].collect().toSet
    assert(got2 == Set(1L))
  }

  test("empty and single-row inputs") {
    val empty = Seq.empty[(Long, Double, Double)].toDF("id", "x", "y")
    assert(Skyline.skyline2d(empty, col("x"), col("y")).isEmpty)
    val one = Seq((1L, 5.0, 5.0)).toDF("id", "x", "y")
    assert(Skyline.skyline2d(one, col("x"), col("y"))
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }
}

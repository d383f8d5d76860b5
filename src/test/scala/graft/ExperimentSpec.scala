package graft

import org.apache.spark.sql.functions._

import graft.ops.Experiment

class ExperimentSpec extends SparkTestBase {
  import spark.implicits._

  private def units(variant: String, n: Int, converted: Int) =
    (1 to n).map(i => (variant, s"$variant-$i", i <= converted))

  test("a real rate difference is detected with the textbook z") {
    // A: 50/100 vs B: 30/100 → z = 0.2/sqrt(0.4·0.6·0.02) ≈ 2.8868
    val df = (units("A", 100, 50) ++ units("B", 100, 30))
      .toDF("v", "u", "c")
    val row = Experiment.abTest(df, col("v"), col("u"), col("c")).head()
    assert(row.getAs[String]("variant_a") == "A")
    assert(row.getAs[Long]("n_a") == 100L &&
      row.getAs[Long]("conv_a") == 50L)
    val z = row.getAs[Double]("z")
    assert(z > 2.886 && z < 2.888, s"z = $z")
    assert(row.getAs[Boolean]("significant"))
  }

  test("equal rates (incl. all-convert) give z = 0, never NaN") {
    val allConv = (units("A", 40, 40) ++ units("B", 60, 60))
      .toDF("v", "u", "c")
    val r1 = Experiment.abTest(allConv, col("v"), col("u"), col("c")).head()
    assert(r1.getAs[Double]("z") == 0.0 && !r1.getAs[Boolean]("significant"))
    val sameRate = (units("A", 40, 10) ++ units("B", 80, 20))
      .toDF("v", "u", "c")
    val r2 = Experiment.abTest(sameRate, col("v"), col("u"), col("c")).head()
    assert(r2.getAs[Double]("z") == 0.0)
  }

  test("a unit converts if ANY of its rows converts (event-level input)") {
    val df = Seq(
      ("A", "u1", false), ("A", "u1", true), ("A", "u1", false),
      ("A", "u2", false),
      ("B", "u3", true), ("B", "u4", false))
      .toDF("v", "u", "c")
    val row = Experiment.abTest(df, col("v"), col("u"), col("c")).head()
    assert(row.getAs[Long]("n_a") == 2L && row.getAs[Long]("conv_a") == 1L)
    assert(row.getAs[Long]("n_b") == 2L && row.getAs[Long]("conv_b") == 1L)
  }

  test("more or fewer than two variants fails loudly") {
    val three = (units("A", 5, 1) ++ units("B", 5, 1) ++ units("C", 5, 1))
      .toDF("v", "u", "c")
    val ex = intercept[IllegalArgumentException] {
      Experiment.abTest(three, col("v"), col("u"), col("c"))
    }
    assert(ex.getMessage.contains("exactly 2 variants"))
  }
}

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

  test("chiSquare: hand-checked 2x2 lattice, independence gives 0") {
    import org.apache.spark.sql.functions.col
    // [[10,20],[20,10]]: margins 30/30, E=15 per cell, d=5 →
    // contrib = floor(25e12/15e6) = 1_666_666 per cell, 4 cells
    val dep = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("r", "c")
    val got = Experiment.chiSquare(dep, col("r"), col("c"))
      .as[(Long, Long, Long)].head()
    assert(got == ((4L * 1666666L, 1L, 60L)))
    // exact independence: every E equals O → chi2 = 0
    val ind = (Seq.fill(6)(("a", "x")) ++ Seq.fill(12)(("a", "y")) ++
      Seq.fill(3)(("b", "x")) ++ Seq.fill(6)(("b", "y")))
      .toDF("r", "c")
    val g2 = Experiment.chiSquare(ind, col("r"), col("c"))
      .as[(Long, Long, Long)].head()
    assert(g2 == ((0L, 1L, 27L)))
  }

  test("mutualInformation: ln2 nano-lattice for perfect dependence") {
    import org.apache.spark.sql.functions.col
    // two symbols, perfectly coupled → I = ln 2 = 0.693147181 (9dp)
    val dep = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("b", "y")))
      .toDF("r", "c")
    val got = Experiment.mutualInformation(dep, col("r"), col("c"))
      .as[(Long, Long)].head()
    assert(got == ((693147181L, 10L)))
    // exact independence → every cell's log ratio is ln 1 = 0
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("r", "c")
    val g2 = Experiment.mutualInformation(ind, col("r"), col("c"))
      .as[(Long, Long)].head()
    assert(g2 == ((0L, 4L)))
  }

  test("chiSquare: absent cells enter the grid with o = 0") {
    import org.apache.spark.sql.functions.col
    // (b, y) never observed: grid must still charge its expected mass
    // margins: rn(a)=3 (2x+1y), rn(b)=1 (1x); cn(x)=3, cn(y)=1; n=4
    // E_micro: (a,x)=2_250_000 (b,x)=750_000 (a,y)=750_000 (b,y)=250_000
    // d: (a,x) 2e6-2.25e6=-0.25e6 → 62500000000/2250000=27777
    //    (b,x) 1e6-0.75e6=0.25e6  → floor(62.5e9/750000)=83333
    //    (a,y) 1e6-0.75e6         → 83333
    //    (b,y) 0-250000           → floor(62.5e9/250000)=250000
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"))
      .toDF("r", "c")
    val got = Experiment.chiSquare(df, col("r"), col("c"))
      .as[(Long, Long, Long)].head()
    assert(got == ((27777L + 83333L + 83333L + 250000L, 1L, 4L)))
  }
}

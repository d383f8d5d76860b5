package graft

import org.apache.spark.sql.functions._

import graft.text.Drift

/** Corpus drift (Jensen–Shannon over hashed-gram buckets): the metric
  * axioms that survive hashing — identity ≈ 0, symmetry, the [0, 1]
  * bound, vocabulary separation — plus layout independence and the
  * fused-within-one-table equivalence.
  */
class DriftSpec extends SparkTestBase {
  import spark.implicits._

  private val english = Seq(
    "the cat sat on the mat", "the dog ate the fish",
    "a cat and a dog", "the fish swam home")
  private val german = Seq(
    "der hund ist ein tier", "die katze und der fisch",
    "ein tier ist da", "der fisch schwimmt")

  private def df(texts: Seq[String]) = texts.toDF("text")

  private def js(a: Seq[String], b: Seq[String]): Double =
    Drift.jsDivergence(df(a), df(b), col("text"), buckets = 256)

  test("identical corpora measure ~zero drift") {
    // not exactly 0: add-1 smoothing is scaled by each side's total,
    // and equal corpora give equal totals — so it IS exactly the
    // same distribution, every per-bucket term 0
    assert(js(english, english) == 0.0)
  }

  test("JS is symmetric and bounded in [0, 1]") {
    val ab = js(english, german)
    val ba = js(german, english)
    assert(ab == ba, s"asymmetric: $ab vs $ba")
    assert(ab > 0.0 && ab <= 1.0, s"out of bounds: $ab")
  }

  test("disjoint vocabularies drift far more than a mild shift") {
    val mild = english.take(3) :+ "the cat swam home"
    val far = js(english, german)
    val near = js(english, mild)
    assert(far > near * 2,
      s"separation failed: disjoint=$far vs mild=$near")
  }

  test("report is exactly `buckets` rows and layout-independent") {
    val a = df(english)
    val b = df(german)
    val r1 = Drift.bucketDrift(a, b, col("text"), 256)
    assert(r1.count() == 256)
    val m1 = r1.select("bucket", "js_term")
      .as[(Int, Double)].collect().toMap
    val m2 = Drift.bucketDrift(
        a.repartition(7), b.repartition(5), col("text"), 256)
      .select("bucket", "js_term").as[(Int, Double)].collect().toMap
    assert(m1 == m2, "drift terms depend on layout")
  }

  test("PSI: identity is 0, a mean shift scores, grid is full") {
    val base = (1 to 1000).map(i => (i % 100).toDouble)
    val shifted = base.map(_ + 40.0)
    val a = base.toDF("v")
    assert(Drift.psi(a, base.toDF("v"), col("v"), 0.0, 200.0, 20) == 0.0)
    val drift = Drift.psi(a, shifted.toDF("v"), col("v"), 0.0, 200.0, 20)
    assert(drift > 0.2, s"mean shift under the classic alert bar: $drift")
    val report = Drift.psiBands(a, shifted.toDF("v"), col("v"), 0.0, 200.0, 20)
    assert(report.count() == 23) // 20 bands + under/over/null
  }

  test("PSI routes underflow, overflow, and nulls to their own bands") {
    val a = Seq(Some(-5.0), Some(5.0), Some(250.0), None).toDF("v")
    val b = Seq(Some(5.0)).toDF("v")
    val bands = Drift.psiBands(a, b, col("v"), 0.0, 200.0, 20)
      .filter(col("c_a") > 0)
      .select("band", "c_a").as[(Int, Long)].collect().toMap
    assert(bands == Map(-1 -> 1L, 0 -> 1L, 20 -> 1L, 21 -> 1L),
      s"band routing wrong: $bands")
  }

  test("PSI empty bands still carry terms when corpus sizes differ") {
    // na != nb makes even an empty band's smoothed probabilities
    // unequal — the densified grid must include them or the total
    // understates
    val a = (1 to 100).map(_ => 5.0).toDF("v")
    val b = (1 to 900).map(_ => 5.0).toDF("v")
    val terms = Drift.psiBands(a, b, col("v"), 0.0, 200.0, 20)
      .filter(col("c_a") === 0 && col("c_b") === 0)
      .select("psi_term").as[Double].collect()
    assert(terms.nonEmpty && terms.forall(_ != 0.0),
      "empty bands lost their size-imbalance terms")
  }

  test("bucketDriftWithin (one fused pass) equals bucketDrift on slices") {
    val tagged = (english.map((_, "a")) ++ german.map((_, "b")))
      .toDF("text", "src")
    val fused = Drift.bucketDriftWithin(
        tagged, col("src") === "a", col("text"), 256)
      .collect().map(_.toSeq).toSet
    val twoPass = Drift.bucketDrift(
        tagged.filter(col("src") === "a"),
        tagged.filter(col("src") =!= "a"),
        col("text"), 256)
      .collect().map(_.toSeq).toSet
    assert(fused == twoPass)
  }
}

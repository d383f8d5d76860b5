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

package graft

import scala.io.Source

/** Pinned sf0.01 golden outputs for the deterministic no-DuckDB-oracle
  * queries (VERDICT r2 ask #4): fixed-seed native expressions make
  * q_simhash_pairs / q_minhash_est / q_doc_winnow /
  * q_doc_winnow_overlap bit-reproducible, so their full sf0.01 result
  * sets are committed fixtures — any drift (seed, banding, winnowing
  * parameters, skew guard) fails here even though DuckDB cannot
  * express the queries. Approximate-with-randomness paths are covered
  * by RECALL.json floors instead (graft.Recall).
  */
class GoldenSpec extends SparkTestBase {

  private val goldenSfDir = "/root/testdata/sf0.01"

  private def fixture(name: String): Set[Seq[Double]] = {
    val in = getClass.getResourceAsStream(s"/golden/${name}_sf0.01.csv")
    assert(in != null, s"missing golden fixture for $name")
    val src = Source.fromInputStream(in)
    try src.getLines().drop(1)
      .map(_.split(',').map(_.toDouble).toSeq).toSet
    finally src.close()
  }

  private def check(name: String): Unit = {
    val df = SparkEntry.queries(name)(spark, goldenSfDir)
    val got: Set[Seq[Double]] = df.collect()
      .map(r => (0 until r.length).map(i => r.get(i).toString.toDouble): Seq[Double])
      .toSet
    val want = fixture(name)
    assert(got == want,
      s"$name drifted from golden fixture: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)} " +
        s"(${got.size} vs ${want.size} rows)")
    spark.catalog.clearCache()
  }

  test("q_simhash_pairs matches its committed sf0.01 golden output") {
    check("q_simhash_pairs")
  }
  test("q_minhash_est matches its committed sf0.01 golden output") {
    check("q_minhash_est")
  }
  test("q_doc_winnow matches its committed sf0.01 golden output") {
    check("q_doc_winnow")
  }
  test("q_doc_winnow_overlap matches its committed sf0.01 golden output") {
    check("q_doc_winnow_overlap")
  }
  // The ANN family is deterministic end-to-end at sf0.01: fixed
  // hyperplane seeds, driver-side Lloyd training (sequential float
  // order, partition-independent), and tie-broken top-k windows —
  // so their full result sets pin as goldens on top of the RECALL.json
  // floors (drift detection, not just quality floors).
  test("q_knn_lsh matches its committed sf0.01 golden output") {
    check("q_knn_lsh")
  }
  test("q_knn_ivf matches its committed sf0.01 golden output") {
    check("q_knn_ivf")
  }
  test("q_embedding_neardup_lsh matches its committed sf0.01 golden output") {
    check("q_embedding_neardup_lsh")
  }
  test("q_embedding_neardup_ivf matches its committed sf0.01 golden output") {
    check("q_embedding_neardup_ivf")
  }
}

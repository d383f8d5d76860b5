package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-
  * reduction step of embedding pipelines (whiten/reduce before
  * clustering or near-dup search), built to the engine's
  * exact-arithmetic discipline.
  *
  * Shape: d is SMALL (an embedding dimension, ≤ a few hundred) while
  * n is the corpus — so the only distributed work is accumulating the
  * d×d second-moment matrix, ONE aggregation pass whose partials are
  * (i, j)-keyed DECIMAL sums (map-side combined, shuffle volume
  * partitions × d² scalars, result d² rows to the driver — the
  * covariance never touches an executor again). The eigensolve on the
  * d×d symmetric matrix is classical cyclic Jacobi on the driver —
  * milliseconds for d = 64 — and the projection back over the corpus
  * is a shuffle-free map expression with the eigenvector matrix
  * inlined as plan literals (the [[KMeans]] assignment pattern).
  *
  * Determinism: moments are exact decimal sums (layout-independent),
  * the Jacobi sweep order is fixed, and sign is normalized (largest-
  * magnitude component of each eigenvector made positive), so the
  * same corpus yields bit-identical components and projections on any
  * cluster layout.
  */
object Pca {

  /** Trained model: per-dimension means and the top-k principal
    * components (rows = components, descending eigenvalue), plus the
    * full eigenvalue spectrum for variance accounting.
    */
  final case class PcaModel(
      mean: Array[Double],
      components: Seq[Array[Double]], // k rows of length d
      eigenvalues: Array[Double]) { // full spectrum, descending
    def varianceExplained(k: Int): Double = {
      val total = eigenvalues.sum
      if (total <= 0d) 0d else eigenvalues.take(k).sum / total
    }
  }

  /** Accumulate mean and second moments: ONE corpus pass through the
    * no-explode [[graft.functions.MomentSumAgg]] — each task keeps the
    * whole d(d+3)/2-cell moment vector as one Array[Long] of 12-dp
    * unscaled sums (map-side combine is elementwise integer addition),
    * and exactly ONE bounded state per partition reaches the final
    * merge. Bit-compatible with the previous exploded
    * (i, j)-keyed DECIMAL(28,12) aggregate (same shortest-repr
    * HALF_UP rounding per product, same exact sums — see the
    * exactness contract on MomentSumAgg) but without the per-cell
    * struct/cast/hash machinery, which was ~4 of the 5.8 s PCA fit at
    * sf0.1. Returns (n, sums[d], moments[d][d]).
    */
  private def moments(
      df: DataFrame, vecCol: String, dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val vecs0 = df.select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull && size(col("v")) === dim)
    // the O(d²)-per-row update dominates the scan, so a small corpus
    // in few files (one parquet partition at local scale) must spread
    // across cores; a wide corpus is already parallel and skips the
    // exchange (integer sums make the result layout-independent
    // either way)
    val par = df.sparkSession.sparkContext.defaultParallelism
    val vecs =
      if (vecs0.rdd.getNumPartitions < par) vecs0.repartition(par) else vecs0
    val aggCol = org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.MomentSumAgg(
        org.apache.spark.sql.GraftSqlShims.expression(col("v")), dim)
        .toAggregateExpression())
    val s = vecs.agg(aggCol.as("m")).head().getStruct(0)
    val n = s.getLong(0)
    val cells = s.getSeq[Long](1)
    def toDouble(unscaled: Long): Double =
      new java.math.BigDecimal(
        java.math.BigInteger.valueOf(unscaled), 12).doubleValue
    val sums = Array.tabulate(dim)(i => toDouble(cells(i)))
    val m = Array.fill(dim, dim)(0.0)
    var idx = dim
    for (i <- 0 until dim; j <- i until dim) {
      val x = toDouble(cells(idx)); idx += 1
      m(i)(j) = x; m(j)(i) = x
    }
    (n, sums, m)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: returns
    * (eigenvalues, eigenvectors as rows), sorted descending, sign-
    * normalized. Deterministic (fixed sweep order, fixed iteration
    * cap).
    */
  private[graft] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-14) {
      off = 0.0
      for (p <- 0 until d; q <- (p + 1) until d) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-18) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t =
            if (theta == 0.0) 1.0
            else math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until d) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val pairs = (0 until d).map(i => (a(i)(i), (0 until d).map(v(_)(i)).toArray))
      .sortBy { case (ev, _) => -ev }
    val vecsOut = pairs.map { case (_, w) =>
      // sign normalization: make the largest-|.| entry positive so the
      // component set is unique (eigenvectors are defined up to sign)
      val mi = w.indices.maxBy(i => math.abs(w(i)))
      if (w(mi) < 0) w.map(x => -x) else w
    }
    (pairs.map(_._1).toArray, vecsOut.toArray)
  }

  /** Fit the top-`k` principal components of `vecCol` over the corpus:
    * one distributed moment pass + a driver eigensolve.
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"need 1 <= k <= $dim, got $k")
    val (n, sums, m) = moments(df, vecCol, dim)
    require(n > 1, s"PCA needs at least 2 vectors of dim $dim, got $n")
    val mean = sums.map(_ / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      m(i)(j) / n - mean(i) * mean(j))
    val (evals, evecs) = jacobiEigen(cov)
    PcaModel(mean, evecs.take(k).toSeq, evals)
  }

  /** Projection expression: `array(c1 .. ck)` with
    * `c_m = Σ_j (v_j − mean_j) · w_mj` — a shuffle-free map over the
    * corpus, components inlined as plan literals. The per-row fold
    * order is fixed (sequential over dims), so projections are
    * deterministic everywhere.
    */
  def projectColumn(vecCol: Column, model: PcaModel): Column = {
    val v = vecCol.cast("array<double>")
    val cols = model.components.map { w =>
      aggregate(
        zip_with(
          zip_with(v, array(model.mean.map(lit(_)): _*), (x, mu) => x - mu),
          array(w.map(lit(_)): _*),
          (x, ww) => x * ww),
        lit(0.0), (acc, x) => acc + x)
    }
    array(cols: _*)
  }

  /** The input plus a `projected` array column of length k. */
  def project(
      df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "projected"): DataFrame =
    df.withColumn(outCol, projectColumn(col(vecCol), model))
}

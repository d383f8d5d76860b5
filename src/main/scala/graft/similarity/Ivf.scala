package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the FAISS
  * IVF-Flat shape, Spark-first: a coarse spherical k-means quantizer
  * splits the corpus into `nlist` cells; each query probes its
  * `nprobe` closest cells and exact-reranks only those candidates.
  *
  * Scale design (100 TB corpus, 1000 executors):
  *  - training touches the corpus `iters` times with map-side argmax
  *    against BROADCAST centroids (k×dim doubles — literals in the
  *    plan), one tiny (cell, pos) aggregate per iteration;
  *  - cell assignment is a pure projection — the corpus shuffles ONCE
  *    on cell_id for the probe join, the recall/cost dial is
  *    nprobe/nlist;
  *  - everything is Column expressions over the native
  *    [[graft.functions.VectorDot]]; no UDFs, no driver-side vectors
  *    beyond the k centroids.
  *
  * Determinism: initialization takes the `nlist` lowest-id vectors and
  * Lloyd's iterations are fixed-count, so the index is identical across
  * runs — recall is measured, not flaky.
  */
object Ivf {

  private def unitize(a: Array[Double]): Array[Double] = {
    val n = math.sqrt(a.map(x => x * x).sum)
    if (n == 0d) a else a.map(_ / n)
  }

  /** FAISS-style corpus-adaptive cell count: ≈ √n, clamped to
    * [8, 4096]. A FIXED nlist is the scale trap this replaces: cells
    * hold n/nlist vectors, so growing the corpus 10× under the same
    * nlist makes every cell 10× denser and recall at a fixed nprobe
    * decays (measured 0.88 → 0.77 from sf0.01 to sf0.1 at nlist=64).
    * √n sizing keeps candidate volume ≈ nprobe·n^1.5 — sub-quadratic —
    * while the probed FRACTION of the corpus (nprobe/√n of it) shrinks
    * as n grows. Costs one count job; callers that know their corpus
    * pass nlist explicitly and skip it.
    */
  private def autoNlist(corpus: DataFrame): Int = {
    val n = corpus.count()
    math.max(8, math.min(4096, math.ceil(math.sqrt(n.toDouble)).toInt))
  }

  /** THE assignment rule, shared by the driver-side and treeAggregate
    * training paths so they can never desynchronize: argmax_c v·c,
    * `>=` ties to the larger index (matching [[ArgTopCells]]'s
    * struct-sort tie rule).
    */
  private def assignBest(
      v: Array[Double], cen: Array[Array[Double]], dim: Int): Int = {
    var best = 0
    var bestD = Double.NegativeInfinity
    var i = 0
    while (i < cen.length) {
      var d = 0.0; var j = 0
      while (j < dim) { d += v(j) * cen(i)(j); j += 1 }
      // Double.compare, not >=: NaN dots must rank ABOVE every double
      // exactly as ArgTopCells' struct-sort does, or a NaN vector
      // trains into a different cell than assignment places it
      if (java.lang.Double.compare(d, bestD) >= 0) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** THE centroid update rule, shared by both training paths: empty
    * cell keeps its centroid, else mean then renormalize (zero-norm
    * mean also keeps the old centroid).
    */
  private def recenter(
      old: Array[Array[Double]],
      sums: Array[Array[Double]],
      counts: Array[Long]): Array[Array[Double]] =
    old.zipWithIndex.map { case (o, i) =>
      if (counts(i) == 0L) o
      else {
        val mean = sums(i).map(_ / counts(i))
        val n = math.sqrt(mean.map(x => x * x).sum)
        if (n == 0d) o else mean.map(_ / n)
      }
    }

  /** (dot, index) argmax over the UNIT centroid set via the native
    * [[graft.functions.ArgTopCells]] expression (ties to the larger
    * index — deterministic). The input vector needs NO normalization:
    * argmax_c v·c is invariant under positive scaling of v, so raw
    * vectors assign to the same cell as their unit form.
    */
  private def bestCell(v: Column, centroids: Seq[Array[Double]]): Column =
    element_at(
      graft.functions.GraftFunctions.argTopCells(v, centroids, 1), 1)

  /** The `nprobe` best cells, exploded to one row each — the
    * multi-assignment used by both the near-dup blocker and the query
    * probe. One native expression instead of nlist inlined literal
    * dots + a struct sort per row (the round-3 form).
    */
  private def probeCellsExploded(
      v: Column, centroids: Seq[Array[Double]], nprobe: Int): Column =
    explode(graft.functions.GraftFunctions.argTopCells(v, centroids, nprobe))

  /** Train the coarse quantizer: spherical k-means on the unit sphere
    * (assign by max dot, re-center by per-dimension mean, re-normalize).
    * Returns `nlist` unit centroids.
    *
    * Each Lloyd's iteration is ONE shuffle-free `treeAggregate` job
    * accumulating (per-cell sum, count) partials — the MLlib KMeans
    * shape, and one of the rare places where dropping to the RDD layer
    * is the right call: the update is a tight per-partition fold into
    * nlist×dim accumulators, with driver traffic that is
    * centroid-sized, never corpus-sized. Init is the `nlist` lowest-id
    * vectors, so the index is reproducible (up to float reduction
    * order in the partial sums).
    */
  def train(
      corpus: DataFrame, // (vec_id, vector)
      dim: Int,
      nlist: Int,
      iters: Int = 5,
      driverMaxVectors: Int = 20000): Seq[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val raw = corpus
      .select(col("vec_id"), col("vector").cast("array<double>").as("v"))
    // Bounded small-corpus fast path (the nearDupClusters driver-side
    // pattern): ONE limited collect probes the size; a sub-20k-vector
    // training set is ≤ 10 MB and Lloyd's on it is milliseconds of
    // driver arithmetic against 1+iters scheduled jobs of pure
    // overhead. Identical update rule (>= tie to the larger index,
    // empty cell keeps its centroid, renormalize) — only the float
    // summation order differs from the tree combine. An overflowing
    // corpus falls through to the treeAggregate path, which is also
    // how FAISS trains at scale: on a bounded sample.
    val probe = raw.orderBy(col("vec_id")).limit(driverMaxVectors + 1)
      .select(col("v")).collect()
    if (probe.length <= driverMaxVectors) {
      val vecs = probe.map(r => unitize(r.getSeq[Double](0).toArray))
      var centroids = vecs.take(nlist).map(_.clone())
      val k = centroids.length
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](dim))
        val counts = new Array[Long](k)
        vecs.foreach { v =>
          val best = assignBest(v, centroids, dim)
          var j = 0
          while (j < dim) { sums(best)(j) += v(j); j += 1 }
          counts(best) += 1
        }
        centroids = recenter(centroids, sums, counts)
      }
      return centroids.toSeq
    }
    var centroids: Array[Array[Double]] = probe.take(nlist)
      .map(r => unitize(r.getSeq[Double](0).toArray))
    val vecs = raw.select(col("v")).as[Seq[Double]].rdd
      .map(s => unitize(s.toArray))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      (0 until iters).foreach { _ =>
        val bc = vecs.context.broadcast(centroids)
        val zero = (Array.fill(nlist)(new Array[Double](dim)),
          new Array[Long](nlist))
        val (sums, counts) = vecs.treeAggregate(zero)(
          seqOp = { case ((s, n), v) =>
            val best = assignBest(v, bc.value, dim)
            var j = 0
            while (j < dim) { s(best)(j) += v(j); j += 1 }
            n(best) += 1
            (s, n)
          },
          combOp = { case ((s1, n1), (s2, n2)) =>
            var i = 0
            while (i < nlist) {
              var j = 0
              while (j < dim) { s1(i)(j) += s2(i)(j); j += 1 }
              n1(i) += n2(i)
              i += 1
            }
            (s1, n1)
          })
        bc.destroy()
        centroids = recenter(centroids, sums, counts)
      }
    } finally vecs.unpersist()
    centroids.toSeq
  }

  /** Embedding near-dup pairs via IVF cell BLOCKING: train the coarse
    * quantizer, assign every vector to its `nprobe` best cells
    * (multi-assignment, so near pairs straddling a cell boundary still
    * co-occur somewhere), generate candidate pairs within cells over
    * bare (id, cell) rows, verify each candidate with one exact cosine.
    *
    * This is the right near-dup blocker when embeddings are CLUSTERED
    * (real corpora are): cells align with the data's own density, so
    * candidate volume ≈ Σ cell² tracks true-pair volume, where
    * random-hyperplane LSH at moderate thresholds degenerates — on the
    * sf0.1 testdata it probes 26% of all pairs for 0.75 recall, while
    * cell blocking reaches comparable recall probing a few percent.
    * Recall is measured against [[graft.dedup.Dedup.embeddingNearDup]]
    * in RECALL.json; (nlist, nprobe) is the recall/cost dial. The
    * default `nlist = 0` auto-sizes to ≈ √n ([[autoNlist]]), which is
    * what keeps recall scale-stable: the sf0.01-calibrated fixed
    * nlist=64 measured 0.77 recall at sf0.1, the √n default measures
    * ≥ 0.93 at both scales (nprobe = 6).
    */
  def cellNearDup(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      nlist: Int = 0,
      nprobe: Int = 6,
      iters: Int = 5,
      maxCell: Int = 100000): DataFrame = {
    val corpus = embeddings.select(
      col(idCol).as("vec_id"), col(vecCol).as("vector"))
    val nl = if (nlist > 0) nlist else autoNlist(corpus)
    val centroids = train(corpus, dim, nl, iters)
    val e = corpus.select(
      col("vec_id"), col("vector").cast("array<double>").as("v"))
      .withColumn("nrm", Knn.norm(col("v")))
      // no-direction rows: see Knn.bruteForceKnn (NaN poisons ranking)
      .filter(col("nrm") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bare (cell, id) rows — vectors never ride the candidate join
    val assigned = e.select(col("vec_id"),
      probeCellsExploded(col("v"), centroids, nprobe).as("cell"))
    // same skew guard as the LSH path: a degenerate hot cell (mass
    // duplicates, undersized nlist) would otherwise go quadratic
    val big = assigned.groupBy(col("cell")).count()
      .filter(col("count") > maxCell).select(col("cell"))
    val ok = assigned.join(broadcast(big), Seq("cell"), "left_anti")
    ok.select(col("cell"), col("vec_id").as("id_a"))
      .join(ok.select(col("cell"), col("vec_id").as("id_b")), Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .join(e.select(col("vec_id").as("id_a"), col("v").as("v_a"),
        col("nrm").as("n_a")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("v").as("v_b"),
        col("nrm").as("n_b")), Seq("id_b"))
      .withColumn("cos",
        Knn.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      // a pair can co-occur in up to nprobe² cells — emit it once
      .dropDuplicates("id_a", "id_b")
  }

  /** IVF top-k: corpus shuffles once on its cell, each query joins only
    * its `nprobe` best cells, exact cosine reranks, windowed top-k (no
    * global sort). Output shape matches [[Knn.bruteForceKnn]].
    */
  def ivfKnn(
      queries: DataFrame, // (query_id, vector)
      corpus: DataFrame,  // (vec_id, vector)
      dim: Int,
      k: Int,
      nlist: Int = 0, // 0 = auto ≈ √n (see autoNlist)
      nprobe: Int = 4,
      iters: Int = 5): DataFrame = {
    val nl = if (nlist > 0) nlist else autoNlist(corpus)
    val centroids = train(corpus, dim, nl, iters)
    val c = corpus.select(
      col("vec_id"), col("vector").cast("array<double>").as("cv"))
      .withColumn("cn", Knn.norm(col("cv")))
      .filter(col("cn") > 0) // no-direction rows: see Knn.bruteForceKnn
      .withColumn("cell", bestCell(col("cv"), centroids))
    // nprobe best cells per query; dot ranking against unit centroids
    // is scale-invariant in the query too, so raw qv works
    val q = broadcast(queries
      .select(col("query_id"), col("vector").cast("array<double>").as("qv"))
      .withColumn("qn", Knn.norm(col("qv")))
      .filter(col("qn") > 0) // no-direction rows: see Knn.bruteForceKnn
      .withColumn("cell", probeCellsExploded(col("qv"), centroids, nprobe)))
    val scored = c.join(q, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        round(Knn.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "score", "rank")
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable linear quality classifier — the fastText-style document
  * quality filter of LLM data pipelines (weak labels in, a scoring
  * function out), hand-rolled on the DataFrame API so the scale story
  * is explicit:
  *
  *  - **training** is batch gradient descent where each iteration is
  *    ONE distributed aggregation pass (map-side partial sums, no
  *    shuffle of rows — only d+2 scalar aggregates cross the wire per
  *    pass). The feature frame is persisted once; 100 TB × 30
  *    iterations = 30 cheap column scans of a cached projection, the
  *    same pass structure as MLlib's LBFGS but with nothing hidden;
  *  - **determinism**: per-row gradient contributions are computed in
  *    double (deterministic per row) and then cast to DECIMAL(28,12)
  *    for the sum — decimal addition is exact, hence associative, so
  *    the learned weights are bit-identical on ANY partitioning or
  *    cluster layout. A double `sum` would drift in the low bits with
  *    the reduction order and break golden pins / cross-run
  *    reproducibility;
  *  - **scoring** folds the learned weights into a literal column
  *    expression — a shuffle-free codegen'd map pass, the same shape
  *    as every other quality signal in [[TextOps]].
  *
  * Features are the engine's own cheap per-document signals (length,
  * punctuation/digit/upper ratios, character entropy, mean token
  * length, stopword rate) — all computed in one scan with zero UDFs.
  */
object QualityModel {

  /** English stopword probes for the stopword-rate feature (public
    * top-frequency function words — the Gopher quality-signal set).
    */
  val Stopwords: Seq[String] =
    Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was")

  /** The standard feature columns over a text column: bias first, all
    * bounded-scale (ratios and logs) so plain GD converges without
    * per-feature normalization state.
    */
  def features(text: Column): Seq[(String, Column)] = {
    import TextOps._
    val chars = charCount(text).cast("double")
    val toks = tokenCount(text).cast("double")
    val safeChars = greatest(chars, lit(1.0))
    val safeToks = greatest(toks, lit(1.0))
    Seq(
      "bias" -> lit(1.0),
      "log_chars" -> log(chars + lit(1.0)),
      "log_tokens" -> log(toks + lit(1.0)),
      "punct_ratio" -> punctCount(text).cast("double") / safeChars,
      "digit_ratio" -> digitCount(text).cast("double") / safeChars,
      "upper_ratio" -> upperCount(text).cast("double") / safeChars,
      "entropy" -> graft.functions.GraftFunctions.charEntropy(text),
      "mean_token_len" -> chars / safeToks,
      "stopword_rate" -> wordHits(text, Stopwords).cast("double") / safeToks)
  }

  /** Train logistic weights by batch gradient descent over
    * STANDARDIZED features (z-scores from one exact-decimal stats
    * pass — raw features at wildly different scales would saturate
    * the sigmoid long before plain GD converges), then fold the
    * standardization back so the returned weights apply to the RAW
    * feature columns.
    *
    * @param df       input frame
    * @param feats    (name, column) features — the FIRST must be the
    *                 constant bias (the fold-back intercept lands on it)
    * @param label    0/1 double column (weak supervision)
    * @param iters    gradient steps (each = one aggregation pass)
    * @param lr       learning rate (standardized space)
    * @return weights aligned with `feats`, for the raw columns
    */
  def train(
      df: DataFrame,
      feats: Seq[(String, Column)],
      label: Column,
      iters: Int = 30,
      lr: Double = 0.5): Array[Double] = {
    require(feats.nonEmpty, "need at least one feature")
    require(iters > 0, s"iters must be positive, got $iters")
    val d = feats.size
    val cols = feats.zipWithIndex.map { case ((_, c), i) => c.as(s"x$i") }
    // drop rows with any null feature or label BEFORE counting: the
    // decimal sums would silently skip them while n still counted
    // them, biasing every mean/gradient by the wrong denominator
    val frame = df.select(cols :+ label.cast("double").as("y"): _*)
      .na.drop().persist()
    try {
      // standardization stats in the same exact-decimal discipline as
      // the gradients: Σx and Σx² per feature — n rides in the SAME
      // pass (a separate count() would be one more scheduled job, and
      // on small data the fixed job cost dominates; see PLANS_r6)
      val statCols = (0 until d).flatMap(i => Seq(
        sum(col(s"x$i").cast("decimal(28,12)")).as(s"s$i"),
        sum((col(s"x$i") * col(s"x$i")).cast("decimal(28,12)")).as(s"q$i")))
      val st = frame
        .agg(statCols.head, statCols.tail :+ count(lit(1)).as("n"): _*)
        .head()
      val n = st.getLong(2 * d).toDouble
      if (n == 0) return new Array[Double](d) // nothing to learn from
      val mean = new Array[Double](d)
      val scale = new Array[Double](d)
      var i = 0
      while (i < d) {
        val s = Option(st.getDecimal(2 * i)).fold(0.0)(_.doubleValue)
        val q = Option(st.getDecimal(2 * i + 1)).fold(0.0)(_.doubleValue)
        val m = s / n
        val v = q / n - m * m
        // constant features (the bias) pass through unstandardized so
        // their weight is the plain intercept
        if (v > 1e-12) { mean(i) = m; scale(i) = math.sqrt(v) }
        else { mean(i) = 0.0; scale(i) = 1.0 }
        i += 1
      }
      val z = (0 until d).map(i =>
        (col(s"x$i") - lit(mean(i))) / lit(scale(i)))
      val w = new Array[Double](d)
      var it = 0
      while (it < iters) {
        // margin = w·z as a literal-folded expression; err = p − y
        val margin = (0 until d).map(i => z(i) * lit(w(i))).reduce(_ + _)
        val p = lit(1.0) / (lit(1.0) + exp(-margin))
        val err = p - col("y")
        // exact decimal partial sums → layout-independent gradients
        val gradCols = (0 until d).map(i =>
          sum((err * z(i)).cast("decimal(28,12)")).as(s"g$i"))
        val row = frame.agg(gradCols.head, gradCols.tail: _*).head()
        i = 0
        while (i < d) {
          val g = row.getDecimal(i)
          // null only if the frame is empty — keep weights at zero
          if (g != null) w(i) -= lr * (g.doubleValue / n)
          i += 1
        }
        it += 1
      }
      // fold back to raw space: Σ wᵢ(xᵢ−mᵢ)/sᵢ = Σ (wᵢ/sᵢ)xᵢ − Σ wᵢmᵢ/sᵢ;
      // the constant term lands on the bias feature (x₀ ≡ 1)
      val out = new Array[Double](d)
      var shift = 0.0
      i = 0
      while (i < d) {
        out(i) = w(i) / scale(i)
        shift += w(i) * mean(i) / scale(i)
        i += 1
      }
      out(0) -= shift
      out
    } finally { frame.unpersist(); () }
  }

  /** The learned model as a score column: sigmoid(w·x) with the
    * weights folded in as literals — shuffle-free, codegen'd, no
    * driver state at scoring time.
    */
  def scoreColumn(
      feats: Seq[(String, Column)], weights: Array[Double]): Column = {
    require(feats.size == weights.length,
      s"${feats.size} features vs ${weights.length} weights")
    val margin = feats.zip(weights)
      .map { case ((_, c), wi) => c * lit(wi) }
      .reduce(_ + _)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** Schema of [[weightsDf]] — the persistence contract; shared with
    * store round-trip readers so it can't drift from the frame.
    */
  val weightsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("idx",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("feature",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("weight",
        org.apache.spark.sql.types.DoubleType, nullable = false)))

  /** Weights as a small DataFrame for persistence / inspection. */
  def weightsDf(
      spark: org.apache.spark.sql.SparkSession,
      feats: Seq[(String, Column)],
      weights: Array[Double]): DataFrame = {
    val rows = feats.map(_._1).zip(weights).zipWithIndex.map {
      case ((name, wi), i) => org.apache.spark.sql.Row(i, name, wi)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), weightsSchema)
  }
}

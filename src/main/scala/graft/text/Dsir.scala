package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR-style data selection — importance resampling over hashed
  * n-gram features (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling", arXiv:2302.03169).
  *
  * The distribution-matching complement to [[QualityModel]] (a
  * discriminative classifier) and [[LangModel]] (a fluency score):
  * given a TARGET corpus (the distribution you want — e.g. curated
  * reference text) and the RAW corpus you are selecting from, estimate
  * bag-of-hashed-n-gram unigram distributions p_target and p_raw over
  * `buckets` hash buckets, weight every raw document by its log
  * importance ratio
  *
  * {{{ log w(x) = Σ_{g ∈ grams(x)} ( ln p_target[b(g)] − ln p_raw[b(g)] ) }}}
  *
  * and resample with Gumbel-top-k on the perturbed weights — which
  * draws k documents WITHOUT replacement with probability proportional
  * to their importance weights, in one distributed top-k pass.
  *
  * Features are word unigrams + adjacent bigrams of lowercased `\S+`
  * tokens (the paper's feature space), hashed to `[0, buckets)` by an
  * md5-prefix — the same engine-portable hashing discipline as
  * [[graft.ops.Sampling]], so a DuckDB oracle replays bucket
  * assignment exactly (`conv(hex,16,10)` ≡ `('0x'||hex)::BIGINT`).
  *
  * Determinism discipline (the [[LangModel]] rules): per-gram log
  * ratios are computed once per BUCKET (bounded table), rounded to 9
  * decimals, and summed per document as DECIMAL(28,12) — exact on any
  * partitioning and replayable by an exact-binary engine. The Gumbel
  * noise is derived from md5 of the document id (not `rand()`), so
  * the "random" sample is the same rows on every run, any layout, any
  * engine.
  *
  * 100 TB shape: fitting is one count aggregation per corpus with
  * map-side partials whose result is bounded by `buckets` (the target
  * corpus is small by construction — it is the curated reference);
  * scoring explodes grams but joins them to the BROADCAST ratio table
  * and reduces immediately to (id, decimal) pairs — one key shuffle,
  * no gram strings cross the wire (buckets are computed map-side);
  * selection is a distributed top-k (TakeOrderedAndProject), never a
  * global sort.
  */
object Dsir {

  /** Fitted model: `(bucket, log_ratio)` for every bucket in
    * `[0, buckets)` — log_ratio = ln p̂_target − ln p̂_raw under add-1
    * smoothing over buckets, rounded to 9 dp. A bounded, broadcastable,
    * trivially persistable table (`buckets` rows).
    */
  final case class DsirModel(buckets: Int, ratios: DataFrame)

  /** Number of md5 hex chars that index `buckets` buckets. */
  private def hexChars(buckets: Int): Int = {
    val h = (math.log(buckets.toDouble) / math.log(16.0)).round.toInt
    require(h >= 1 && h <= 4 && math.pow(16.0, h.toDouble).toInt == buckets,
      s"buckets must be a power of 16 (16, 256, 4096, 65536), got $buckets")
    h
  }

  /** Hash a gram string to `[0, buckets)`: integer value of the first
    * `log16(buckets)` md5 hex chars. Uniform, engine-portable.
    */
  private[text] def bucketOf(gram: Column, buckets: Int): Column =
    conv(substring(md5(gram), 1, hexChars(buckets)), 16, 10).cast("int")

  /** Unigrams ++ adjacent bigrams over a token array column. */
  private[text] def gramsCol(toks: Column): Column =
    concat(toks, LangModel.bigramsCol(toks))

  private def tokensOf(textCol: Column): Column =
    TextOps.tokens(lower(textCol))

  /** One count pass: `(bucket, c)` over a corpus's hashed grams —
    * map-side partials, result bounded by `buckets`. The token array
    * is PROJECTED before the gram expression sees it (the
    * [[LangModel]] rule): `element_at` inside the bigram lambda would
    * otherwise re-run the tokenizer regex per window — quadratic in
    * document length.
    */
  def bucketCounts(
      docs: DataFrame, textCol: Column, buckets: Int): DataFrame =
    docs.select(tokensOf(textCol).as("__toks"))
      .select(explode(gramsCol(col("__toks"))).as("g"))
      .select(bucketOf(col("g"), buckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))

  /** Fit the importance model from a target and a raw corpus: two
    * bounded count passes, densified over all `buckets` buckets (a
    * zero-count bucket still has a smoothed probability), log ratio
    * per bucket rounded to 9 dp.
    */
  def fit(
      target: DataFrame,
      raw: DataFrame,
      textCol: Column,
      buckets: Int = 4096): DsirModel = {
    // ONE count pass per corpus; both results are bounded by
    // `buckets`, so they collect. Finishing the ratio arithmetic
    // driver-side (BigDecimal.valueOf(..).setScale(9, HALF_UP) IS
    // Spark's round(x, 9)) breaks the lineage: the model is literal
    // bounded data, so scoring never silently re-runs a corpus count
    // pass the way a live `crossJoin(totals)` plan would on every
    // evaluation. libm log implementations are only ~0.5–1 ulp
    // accurate and not guaranteed identical across engines — the 9-dp
    // rounding here (and on every column derived from these ratios)
    // is the tolerance mechanism that absorbs that last ulp; a ratio
    // landing within an ulp of a 9-dp HALF_UP boundary could still in
    // principle flip, which is why downstream sums stay DECIMAL.
    val tc = bucketCounts(target, textCol, buckets)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rc = bucketCounts(raw, textCol, buckets)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    ratioModel(tc, rc, buckets, target.sparkSession)
  }

  /** [[fit]] when the target corpus is a predicate-selected slice of
    * the raw corpus (the standard DSIR shape: importance-sample raw
    * toward a high-quality slice of itself). ONE count pass computes
    * both corpora's bucket counts — `count(*)` for raw and a
    * conditional count for the slice ride the same aggregate — so the
    * raw corpus is tokenized and scanned once, not twice. Counts, and
    * with them the model, are identical to
    * `fit(raw.filter(targetPred), raw, …)`.
    */
  def fitWithin(
      raw: DataFrame,
      targetPred: Column,
      textCol: Column,
      buckets: Int = 4096): DsirModel = {
    // tokens materialize in their own projection BEFORE the gram
    // expression references them (twice: unigrams + bigrams) — inlining
    // tokensOf into gramsCol re-runs the regexp tokenizer per reference
    val agg = raw
      .select(tokensOf(textCol).as("__toks"), targetPred.as("__p"))
      .select(col("__p"), explode(gramsCol(col("__toks"))).as("g"))
      .select(col("__p"), bucketOf(col("g"), buckets).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cr"),
        count(when(col("__p"), lit(1))).as("ct"))
      .collect()
    val rc = agg.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val tc = agg.map(r => r.getInt(0) -> r.getLong(2)).toMap
    ratioModel(tc, rc, buckets, raw.sparkSession)
  }

  /** Smoothed log-ratio table from bucket-count maps (the shared tail
    * of [[fit]]/[[fitWithin]] — see fit for the 9-dp contract).
    */
  private def ratioModel(
      tc: Map[Int, Long],
      rc: Map[Int, Long],
      buckets: Int,
      spark: org.apache.spark.sql.SparkSession): DsirModel = {
    import spark.implicits._
    val nt = tc.values.sum.toDouble
    val nr = rc.values.sum.toDouble
    val b = buckets.toDouble
    val ratios = (0 until buckets).map { bk =>
      val v = math.log((tc.getOrElse(bk, 0L) + 1.0) / (nt + b)) -
        math.log((rc.getOrElse(bk, 0L) + 1.0) / (nr + b))
      (bk, java.math.BigDecimal.valueOf(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue)
    }.toDF("bucket", "log_ratio")
    DsirModel(buckets, ratios)
  }

  /** Per-document log importance weight under `model`:
    * `(id, n_grams, logw_sum, dsir_logw)`. Empty documents get an
    * exact zero sum (a no-evidence document is weight-neutral, not
    * dropped). ZERO shuffles: the bounded ratio table is an array
    * literal in the plan and each document folds its own grams
    * sequentially — a pure codegen'd scan at any corpus size.
    *
    * Both `logw_sum` and `dsir_logw` EMIT as the decimal sum rounded
    * to 9 dp as a double — the [[LangModel.scoreDocs]] rule, twice
    * over: a bare DECIMAL(38,12)→double cast diverges in the last ulp
    * between engines once the unscaled magnitude nears 2^53, and a raw
    * DECIMAL output column renders as `decimal.Decimal` under a
    * pyarrow reader vs float64 under duckdb→pandas, so it can never
    * hash-match a float oracle even when bit-exact (the round-8
    * driver-red class). The sum is exactly a 9-dp lattice value, so a
    * 9-dp round on both sides recovers the identical double;
    * accumulation stays DECIMAL internally for layout independence.
    */
  def scoreDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: DsirModel): DataFrame = {
    // the bounded ratio table rides the PLAN as one array literal
    // indexed by bucket (a single Literal object, not 4096 codegen'd
    // children), so scoring is a pure shuffle-free scan: per document,
    // one sequential decimal fold over its grams. Exact decimal
    // addition is associative, so this equals the previous
    // explode → broadcast-join → groupBy-sum form bit-for-bit while
    // skipping its exchange entirely.
    val arr = new Array[Double](model.buckets)
    model.ratios.collect().foreach(r => arr(r.getInt(0)) = r.getDouble(1))
    val ratioLit = typedLit(arr.toSeq)
    // accumulate at (37,12): each add widens to an EXACT (38,12) and
    // the cast back to (37,12) is scale-preserving (a (38,12)
    // accumulator would make the add itself clamp to (38,11), rounding
    // a digit off mid-fold)
    val zero = lit(BigDecimal(0)).cast("decimal(37,12)")
    docs
      .select(col(idCol), tokensOf(col(textCol)).as("__toks"))
      .select(col(idCol),
        coalesce(gramsCol(col("__toks")), array().cast("array<string>"))
          .as("__grams"))
      .select(col(idCol),
        size(col("__grams")).cast("long").as("n_grams"),
        aggregate(col("__grams"), zero, (acc, g) =>
          (acc + element_at(ratioLit, bucketOf(g, model.buckets) + 1)
            .cast("decimal(28,12)")).cast("decimal(37,12)"))
          .cast("decimal(38,12)").as("logw_sum"))
      .select(col(idCol), col("n_grams"),
        round(col("logw_sum").cast("double"), 9).as("logw_sum"),
        round(col("logw_sum").cast("double"), 9).as("dsir_logw"))
  }

  /** Deterministic Gumbel noise for a document id: md5-derived uniform
    * in (0,1) → −ln(−ln(u)). 12 hex chars = 48 bits, exact in a
    * double; +1 on both sides keeps u strictly inside (0,1).
    */
  private[text] def gumbelOf(id: Column): Column = {
    val m = math.pow(16.0, 12.0) // 2^48, exact
    val u = (conv(substring(md5(id.cast("string")), 1, 12), 16, 10)
      .cast("double") + lit(1.0)) / lit(m + 2.0)
    -log(-log(u))
  }

  /** Gumbel-top-k importance resampling: draw `k` documents without
    * replacement with probability ∝ exp(logw / temperature) — the
    * Gumbel-max trick makes that a single distributed top-k on
    * `logw/T + Gumbel(md5(id))`. Deterministic: same k rows on every
    * run, any layout, any engine that agrees on md5 and IEEE doubles.
    * Returns the scored schema plus `gumbel_key`, ordered by the key
    * (ties broken by id).
    *
    * The key is rounded to 9 dp and the ORDERING uses the rounded key:
    * the Gumbel noise passes through `ln` twice, and libm `ln` is only
    * ~0.5 ulp accurate across platforms — ranking on the rounded key
    * (ties to id) makes the selected SET, not just the emitted values,
    * invariant to that last ulp.
    */
  def resample(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: DsirModel,
      k: Int,
      temperature: Double = 1.0): DataFrame = {
    require(temperature > 0.0, s"temperature must be > 0, got $temperature")
    scoreDocs(docs, idCol, textCol, model)
      .withColumn("gumbel_key",
        round(col("dsir_logw") / lit(temperature) + gumbelOf(col(idCol)), 9))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based bigram language model for perplexity-style quality
  * filtering — the CCNet/Gopher pipeline stage that ranks documents by
  * how "language-like" they are under a corpus LM (CCNet uses KenLM
  * perplexity; the counting form here is its exact-arithmetic,
  * engine-native analogue).
  *
  * Training is two count aggregations (ONE shuffle each, map-side
  * partial counts): unigram and bigram frequencies over lowercased
  * `\S+` tokens. Scoring attaches add-½ smoothed conditional
  * probabilities to every adjacent token pair and averages their log:
  *
  * {{{ score(doc) = mean_i  ln( (C(w_i, w_{i+1}) + ½) / (C(w_i) + ½·V) ) }}}
  *
  * Determinism discipline (the [[QualityModel]] rules, extended to an
  * oracle-checkable form):
  *
  *  - each per-term log-probability is computed in double with a FIXED
  *    operation order and rounded to 9 decimals — after which Spark's
  *    shortest-repr rounding and an exact-binary engine (DuckDB)
  *    agree bit-for-bit (raw scale-12 casts of unrounded doubles do
  *    NOT: the two expansions diverge past the 12th digit);
  *  - per-document totals sum those terms as DECIMAL(28,12) — exact,
  *    order-free, so scores are identical on any partitioning;
  *  - the mean is one decimal→double cast and one division at the end.
  *
  * 100 TB shape: [[scoreDocs]] joins term tables keyed by the bigram
  * string — the oracle-exact twin (a DuckDB oracle must replay the
  * join on text). The production path is the same code over a PRUNED
  * model ([[prune]]): vocab-bounded tables broadcast, scoring becomes
  * two broadcast joins plus one integer-keyed per-document
  * aggregation; absent bigrams fall to the smoothing floor, which is
  * exactly how a count-pruned LM degrades.
  */
object LangModel {

  /** Learned model: unigram counts `(w, c_uni)`, bigram counts
    * `(b, c_bi)` with `b = "w1 w2"`, and the smoothing vocabulary size
    * (distinct unigrams at TRAIN time — pruning must not change it, or
    * scores silently re-scale).
    */
  final case class BigramLm(
      unigrams: DataFrame,
      bigrams: DataFrame,
      vocabSize: Long)

  /** Adjacent-token-pair strings per document in position order
    * (empty below two tokens). Evaluated over a projected token
    * array, so the tokenizer regex runs once per document, not once
    * per window.
    */
  private[text] def bigramsCol(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  private def termFrame(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(TextOps.tokens(lower(textCol)).as("__toks"))
      .select(explode(bigramsCol(col("__toks"))).as("b"))

  /** Count the model: one unigram and one bigram aggregation pass. */
  def train(docs: DataFrame, textCol: Column): BigramLm = {
    val uni = docs
      .select(explode(TextOps.tokens(lower(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_uni"))
    val bi = termFrame(docs, textCol)
      .groupBy(col("b")).agg(count(lit(1)).as("c_bi"))
    BigramLm(uni, bi, uni.count())
  }

  /** Production-path model: drop bigrams below `minBigramCount` (the
    * long tail is most of the table; a pruned model broadcasts).
    * Unigrams and V are kept — they are the smoothing denominator, and
    * scoring degrades exactly as count-pruning should: missing pairs
    * fall to the add-½ floor.
    */
  def prune(lm: BigramLm, minBigramCount: Long): BigramLm =
    lm.copy(bigrams = lm.bigrams.filter(col("c_bi") >= minBigramCount))

  /** Per-document mean bigram log-probability under `lm`:
    * `(id, n_bigrams, logp_sum, lm_score)`; documents with fewer than
    * two tokens score null (no bigram evidence), with `n_bigrams` 0
    * and an exact zero sum.
    *
    * `logp_sum` ACCUMULATES as exact DECIMAL (order-independent on any
    * layout) but is EMITTED as `round(cast(double), 9)`: a raw DECIMAL
    * output column renders as `decimal.Decimal` under one parquet
    * reader and float64 under another, so it can never hash-match a
    * float oracle even when bit-exact — the round-8 driver-red class.
    * The sum is a 9-dp lattice value of magnitude ≪ 2^53/10⁹, so the
    * rounded double is the same bits in every engine.
    *
    * `lm_score` is the 9-dp HALF_UP rounding of `logp_sum/n_bigrams`,
    * computed entirely in LONG INTEGER arithmetic. Neither a bare
    * DECIMAL→double cast (not correctly rounded in every engine once
    * the unscaled magnitude nears 2^53) nor `round(double, 9)` (an
    * engine rounding via `x*1e9` float multiply disagrees with exact
    * decimal HALF_UP precisely on half-boundaries) is cross-engine
    * hash-stable here — and because the sum is an exact 9-dp lattice
    * value, quotients by 10-smooth counts land EXACTLY on 9-dp
    * half-boundaries (2% of the sf0.01 corpus measured). So:
    * `S9 = logp_sum·10^9` (exact — the sum of 9-dp terms has ≤ 9
    * decimals), `k = (2·|S9| + n) div (2·n)` (the integer HALF_UP of
    * `|S9|/n`), `lm_score = ±k / 10^9` (k ≈ |score|·10^9 is exact in
    * a double; one correctly-rounded division). Every step is exact
    * integer math an oracle replays bit-for-bit. Bound: |logp_sum| <
    * 4.6·10^9 keeps 2·|S9| inside a long — a mean-log-prob sum only
    * nears that with ~10^8-token documents, far past the engine's
    * per-document envelope.
    */
  def scoreDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lm: BigramLm): DataFrame = {
    val v = lm.vocabSize.toDouble
    val terms = docs
      .select(col(idCol), TextOps.tokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol), explode(bigramsCol(col("__toks"))).as("b"))
      .withColumn("prefix", substring_index(col("b"), " ", 1))
    val lp = round(
      log((coalesce(col("c_bi"), lit(0L)) + lit(0.5)) /
        (coalesce(col("c_uni"), lit(0L)) + (lit(0.5) * lit(v)))), 9)
    val perDoc = terms
      .join(lm.bigrams, Seq("b"), "left")
      .join(lm.unigrams, terms("prefix") === lm.unigrams("w"), "left")
      .select(col(idCol), lp.cast("decimal(28,12)").as("lp"))
      .groupBy(col(idCol))
      .agg(sum(col("lp")).as("logp_sum"), count(lit(1)).as("n_bigrams"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("logp_sum"),
          lit(BigDecimal(0)).cast("decimal(38,12)")).as("logp_sum"))
      .withColumn("__s9",
        (col("logp_sum").cast("decimal(26,12)") * lit(1000000000L))
          .cast("long"))
      .withColumn("lm_score",
        when(col("n_bigrams") > 0,
          (when(col("__s9") < 0, lit(-1L)).otherwise(lit(1L)) *
            expr("(2 * abs(__s9) + n_bigrams) div (2 * n_bigrams)"))
            .cast("double") / lit(1.0e9)))
      .withColumn("logp_sum", round(col("logp_sum").cast("double"), 9))
      .drop("__s9")
  }
}

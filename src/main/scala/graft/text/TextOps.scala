package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything here is a pure Column expression built from
  * `org.apache.spark.sql.functions` — no UDFs — so the whole pipeline
  * stays inside whole-stage codegen and scales linearly with executors:
  * a 100 TB corpus is just `documents.select(...)` with no shuffle at
  * all for per-document features.
  *
  * Regex patterns are restricted to the syntax subset that Java regex
  * (Spark) and RE2 (DuckDB oracle) interpret identically.
  */
object TextOps {

  /** Whitespace-delimited tokens. `regexp_extract_all('\S+')` rather
    * than `split` — split's trailing-empty behavior differs across
    * engines; extract_all of non-space runs is unambiguous.
    */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Canonical text cleanup: Unicode NFC composition (the native
    * [[graft.functions.NfcNormalize]] expression — visually identical
    * strings with different codepoint sequences fingerprint apart and
    * slip every dedup until composed), whitespace runs collapsed to
    * single spaces, ends trimmed. DuckDB replays it as
    * `trim(regexp_replace(nfc_normalize(text), '\s+', ' ', 'g'))`.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      graft.functions.GraftFunctions.nfcNormalize(text),
      "\\s+", " "))

  def charCount(text: Column): Column = length(text)

  /** Count of punctuation characters (fixed class shared with RE2). */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0)))

  def upperCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Z]"), lit(0)))

  def digitCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[0-9]"), lit(0)))

  /** TF-IDF per (document, term): raw term frequency × ln(N/df), no
    * smoothing. Classic corpus weighting for retrieval/quality
    * pipelines. ONE tokenize+explode pass over the corpus text: the
    * (doc,term) frequency table is unique per pair, so document
    * frequency is just `tf.groupBy(term).count` — no second explode.
    * The tf intermediate is persisted because two plan branches read
    * it (caller or session owns `clearCache`, same contract as
    * [[graft.dedup.Dedup]]); the corpus size broadcasts as a scalar.
    */
  def tfidf(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(total))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .select("doc_id", "term", "tf", "df", "tfidf")
  }

  /** BM25 per (document, term): the Robertson/Sparck-Jones ranking
    * function — `idf⁺ · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with
    * `idf⁺ = ln((N−df+0.5)/(df+0.5) + 1)` (the Lucene non-negative
    * form). One tokenize pass like [[tfidf]] (dl and df derive from
    * the persisted tf table — same caller-owns-clearCache contract)
    * plus a broadcast of the two corpus scalars (N, avgdl).
    */
  def bm25(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    // one tokenize+explode pass; dl (doc length) and df (doc freq) both
    // derive from the persisted (doc,term,tf) table — the round-3 form
    // re-exploded the corpus text four times (tf, dl, df, totals)
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val totals = docs.select(col(idCol).as("doc_id"))
      .join(dl, Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n_docs"),
        avg(coalesce(col("dl"), lit(0L))).as("avgdl"))
    val idf = log(
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val norm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("dl").cast("double") / col("avgdl")))
    tf.join(dl, Seq("doc_id"))
      .join(df, Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("bm25", round(idf * norm, 6))
      .select("doc_id", "term", "tf", "bm25")
  }

  /** BM25 top-k retrieval: score a (small) query table against the
    * corpus and return the `k` best documents per query — the search
    * half of [[bm25]]. Query text tokenizes like document text;
    * repeated terms within one query count once (the `distinct` on
    * (qid, term) — standard bag-of-words-with-binary-query-tf BM25).
    *
    * Scale shape: the corpus pays the SAME one tokenize+explode pass
    * as [[bm25]] (dl/avgdl need every posting), but everything
    * downstream of the semi-join touches ONLY the postings of query
    * terms — df, the weight arithmetic, and the per-(query, doc) score
    * aggregate all run over |matched postings|, not |corpus postings|.
    * The query table broadcasts (a search workload's query batch is
    * bounded); the final top-k is the bounded-heap collect aggregate
    * ([[graft.ops.TopK]]) — a broad query matching 10⁸ documents costs
    * O(n log k) per map task and ships ≤ k-row states, where a window
    * row_number would shuffle and sort every scored row per query.
    * Scores are exact DECIMAL(18,6) sums of the 6-dp per-term weights,
    * so ranking (score desc, doc_id asc) is deterministic and
    * cross-engine stable — no FP sum-order dependence. The EMITTED
    * `score` is that decimal rounded to a 6-dp double: a raw DECIMAL
    * output column renders as `decimal.Decimal` under a pyarrow reader
    * vs float64 under duckdb→pandas, so it can never hash-match a
    * float oracle even when bit-exact (the round-8 driver-red class);
    * a scale-6 value of magnitude < 10⁶ is the same double in every
    * engine after the round.
    */
  def bm25Search(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      queries: org.apache.spark.sql.DataFrame,
      qidCol: String, qtextCol: String,
      k: Int = 5, k1: Double = 1.2, b: Double = 0.75)
      : org.apache.spark.sql.DataFrame = {
    require(k > 0, s"top-k needs k > 0, got $k")
    val qterms = queries.select(col(qidCol).as("qid"),
        explode(tokens(lower(col(qtextCol)))).as("term"))
      .distinct()
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // postings restricted to query vocabulary — df over tfq equals df
    // over tf for these terms (tf is unique per (doc, term))
    val tfq = tf.join(broadcast(qterms.select("term").distinct()),
      Seq("term"), "left_semi")
    val df = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val totals = docs.select(col(idCol).as("doc_id"))
      .join(dl, Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n_docs"),
        avg(coalesce(col("dl"), lit(0L))).as("avgdl"))
    val idf = log(
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val norm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * col("dl").cast("double") / col("avgdl")))
    val scores = tfq.join(dl, Seq("doc_id"))
      .join(df, Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("w", round(idf * norm, 6).cast("decimal(18,6)"))
      .join(broadcast(qterms), Seq("term"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("w")).cast("decimal(18,6)").as("score"))
    // (score desc, doc_id asc): doc_id rides along negated so the
    // single `largest` struct ordering breaks ties toward smaller ids
    graft.ops.TopK.topKPerGroup(
        scores.withColumn("neg_id", -col("doc_id")),
        Seq("qid"),
        struct(col("score"), col("neg_id"), col("doc_id")),
        k, largest = true)
      .select(col("qid"), col("rank"), col("doc_id"),
        round(col("score").cast("double"), 6).as("score"))
  }

  /** RM3 pseudo-relevance-feedback search (Lavrenko & Croft relevance
    * models; the RM3 interpolation of Abdul-Jaleel et al., TREC'04):
    * BM25 retrieve → estimate an expansion-term distribution from the
    * top `fbDocs` feedback documents → re-search with the original
    * query interpolated against the expansion terms. The classic
    * recall lever when queries underspecify vocabulary.
    *
    *  - RM1 term weights: `p(t|R) = Σ_d (tf(t,d)/dl(d)) · wd(d)` over
    *    the feedback docs, `wd` the BM25-score-normalized doc weight;
    *    top `fbTerms` terms by (weight desc, term asc).
    *  - RM3: `w(t) = β·p_orig(t) + (1−β)·p_rm(t)` with
    *    `p_orig = 1/|q|` uniform over the original terms.
    *  - Re-score: `Σ_t w(t) · bm25(t, d)` over the expanded
    *    vocabulary, top `k` by (score desc, doc_id asc).
    *
    * Engine-exactness (the bm25Search discipline extended): per-term
    * BM25 weights stay 6-dp DECIMAL; every derived scalar (normalized
    * doc weight, RM1 contribution, interpolated weight, rescore
    * contribution) is one fixed sequence of correctly-rounded IEEE
    * ops over engine-identical operands, snapped to the 9-dp lattice
    * BEFORE each exact-decimal sum — so both ranking passes and the
    * emitted scores replay in DuckDB to hash equality.
    *
    * Scale: two bm25-shaped passes (query-vocabulary semi-joins keep
    * every stage on matched postings) plus feedback-bounded
    * intermediates — `fb` is ≤ fbDocs rows per query, the RM1 window
    * ranks only the feedback docs' vocabulary, and the expanded
    * vocabulary is ≤ |q| + fbTerms terms per query.
    *
    * `beta` must carry a SHORT exact decimal expansion (0.5, 0.25,
    * 0.75…): its exact binary value becomes a decimal literal in the
    * interpolation, and a value like 0.3 would drag its full binary
    * expansion into the decimal plan.
    */
  def rm3Search(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      queries: org.apache.spark.sql.DataFrame,
      qidCol: String, qtextCol: String,
      fbDocs: Int = 10, fbTerms: Int = 10, beta: Double = 0.5,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75)
      : org.apache.spark.sql.DataFrame = {
    require(fbDocs > 0, s"fbDocs must be positive, got $fbDocs")
    require(fbTerms > 0, s"fbTerms must be positive, got $fbTerms")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1], got $beta")
    require(k > 0, s"top-k needs k > 0, got $k")
    val qt = queries.select(col(qidCol).as("qid"),
        explode(tokens(lower(col(qtextCol)))).as("term"))
      .distinct()
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val totals = docs.select(col(idCol).as("doc_id"))
      .join(dl, Seq("doc_id"), "left")
      .agg(count(lit(1)).as("n_docs"),
        avg(coalesce(col("dl"), lit(0L))).as("avgdl"))
    // per-(doc, term) BM25 weight over a given vocabulary — the
    // bm25Search formula verbatim (6-dp DECIMAL)
    def weights(terms: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val tfv = tf.join(broadcast(terms.select("term").distinct()),
        Seq("term"), "left_semi")
      val df = tfv.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val idf = log((col("n_docs") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0))
      val nrm = col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl").cast("double") / col("avgdl")))
      tfv.join(dl, Seq("doc_id")).join(df, Seq("term"))
        .crossJoin(broadcast(totals))
        .withColumn("w", round(idf * nrm, 6).cast("decimal(18,6)"))
        .select("doc_id", "term", "w")
    }
    // pass 1: original-query BM25 → feedback docs
    val s1 = weights(qt.select("term")).join(broadcast(qt), Seq("term"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("w")).cast("decimal(18,6)").as("score"))
    val fb = graft.ops.TopK.topKPerGroup(
        s1.withColumn("neg_id", -col("doc_id")), Seq("qid"),
        struct(col("score"), col("neg_id"), col("doc_id")),
        fbDocs, largest = true)
      .select(col("qid"), col("doc_id"), col("score"))
      .persist()
    val ssum = fb.groupBy(col("qid"))
      .agg(sum(col("score")).cast("decimal(18,6)").as("ssum"))
    val wdoc = fb.join(ssum, Seq("qid"))
      .withColumn("wd", round(
        col("score").cast("double") / col("ssum").cast("double"), 9))
      .select("qid", "doc_id", "wd")
    // RM1 over the feedback docs' own vocabulary
    val prm = wdoc.join(tf, Seq("doc_id")).join(dl, Seq("doc_id"))
      .withColumn("c",
        round((col("tf") / col("dl")) * col("wd"), 9)
          .cast("decimal(18,9)"))
      .groupBy(col("qid"), col("term"))
      .agg(sum(col("c")).cast("decimal(18,9)").as("p_rm"))
    // top expansion terms: the vocabulary of ≤ fbDocs docs per query
    // is bounded, so a per-query window rank is cheap here (terms are
    // strings — the bounded-heap's negation tie-break is numeric-only)
    val wTerm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("p_rm").desc, col("term").asc)
    val expTerms = prm.withColumn("rn", row_number().over(wTerm))
      .filter(col("rn") <= fbTerms)
      .select(col("qid"), col("term"), col("p_rm"))
    // RM3 interpolation
    val nq = qt.groupBy(col("qid")).agg(count(lit(1)).as("nq"))
    val orig = qt.join(nq, Seq("qid"))
      .withColumn("p_orig",
        round(lit(1.0) / col("nq").cast("double"), 9))
      .select("qid", "term", "p_orig")
    // the interpolation and the rescore product run in EXACT DECIMAL:
    // β·(9-dp lattice) lands on 10-dp midpoints every second value,
    // exactly where a double round's half-case behavior diverges
    // between engines — decimal arithmetic has no half-case ambiguity
    // (both engines round exact decimals half-away-from-zero)
    val bDec = lit(new java.math.BigDecimal(beta))
    val mDec = lit(new java.math.BigDecimal(1.0 - beta))
    val zero9 = lit(0).cast("decimal(18,9)")
    val wq = orig.join(expTerms, Seq("qid", "term"), "full_outer")
      .select(col("qid"), col("term"),
        round(
          bDec * coalesce(col("p_orig").cast("decimal(18,9)"), zero9) +
            mDec * coalesce(col("p_rm"), zero9),
          9).cast("decimal(18,9)").as("wt"))
    // pass 2: rescore over the expanded vocabulary
    val s2 = weights(wq.select("term")).join(broadcast(wq), Seq("term"))
      .withColumn("c",
        round(col("wt") * col("w"), 9).cast("decimal(18,9)"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("c")).cast("decimal(18,9)").as("score2"))
    graft.ops.TopK.topKPerGroup(
        s2.withColumn("neg_id", -col("doc_id")), Seq("qid"),
        struct(col("score2"), col("neg_id"), col("doc_id")),
        k, largest = true)
      .select(col("qid"), col("rank"), col("doc_id"),
        round(col("score2").cast("double"), 9).as("score"))
  }

  /** BPE-style token-count estimate: the GPT-2 pre-tokenizer pattern
    * (letter runs / digit runs / punctuation runs, each with an
    * optional leading space) restricted to the Java-regex ∩ RE2 common
    * subset — no lookahead, no unicode classes. Counts pre-tokens, the
    * standard cheap proxy for subword token counts at corpus scale.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(
      text, lit(" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"), lit(0)))

  /** Out-of-vocabulary rate per document against the corpus's own
    * top-`vocabSize` token vocabulary — the standard tokenizer-
    * coverage / domain-shift diagnostic for training corpora (a
    * rising OOV rate against a reference vocab means the tokenizer
    * or the filter cascade no longer fits the incoming data).
    *
    * Scale shape: ONE tokenize+explode pass. The vocabulary is a
    * bounded top-k by (count desc, token asc) — deterministic
    * tie-break, TakeOrderedAndProject, never a global sort — and
    * attaches to the token stream by BROADCAST left join; the per-doc
    * aggregation's partial combine runs map-side (explode preserves
    * row locality, so one doc's tokens never cross partitions before
    * the partial), meaning the only exchanges carry vocab-sized and
    * doc-level partials — token rows themselves never shuffle.
    * Documents with no tokens keep a (0, 0) row via the left join
    * from the base table.
    *
    * @return (id, n_tokens, n_oov, oov_bp) — rate in basis points,
    *         floor division, 0 for empty documents
    */
  def oovRate(
      docs: org.apache.spark.sql.DataFrame,
      idCol: Column, textCol: Column,
      vocabSize: Int): org.apache.spark.sql.DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val tok = docs.select(idCol.as("id"),
      explode(tokens(textCol)).as("token"))
    val vocab = tok.groupBy(col("token"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token").asc)
      .limit(vocabSize)
      .select(col("token").as("vtok"), lit(1).as("inv"))
    val perDoc = tok
      .join(broadcast(vocab), col("token") === col("vtok"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("inv").isNull, 1L).otherwise(0L)).as("n_oov"))
    docs.select(idCol.as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_bp",
        when(col("n_tokens") === 0L, 0L)
          .otherwise(expr("n_oov * 10000 div n_tokens")))
  }

  /** Pairwise vocabulary Jaccard between corpus slices (sources,
    * snapshots, domains) — the cheap corpus-similarity diagnostic
    * that flags a source whose language no longer resembles the rest
    * of the mix, and a precursor check before merging crawls.
    *
    * Scale shape: ONE tokenize+explode pass collapsed to the distinct
    * (slice, token) vocabulary (localCheckpoint-ed — the self-join
    * reads it twice and the size table once; the triangleCounts
    * lesson). The self-join key is the token, and because rows are
    * DISTINCT per slice, per-token fan-out is bounded by #slices² —
    * corpus growth adds vocabulary rows, never join blow-up. All
    * #slices² pairs appear in the output (zero-overlap pairs
    * included, via the bounded margins grid). Jaccard in integer
    * basis points — no float anywhere.
    *
    * @return (s1, s2, inter, union_nv, jaccard_bp) for s1 < s2
    */
  def sourceVocabOverlap(
      docs: org.apache.spark.sql.DataFrame,
      sliceCol: Column, textCol: Column)
      : org.apache.spark.sql.DataFrame = {
    val st = docs
      .select(sliceCol.as("src"), explode(tokens(textCol)).as("token"))
      .distinct()
      .localCheckpoint()
    val sizes = st.groupBy(col("src")).agg(count(lit(1)).as("nv"))
    val inter = st.as("a")
      .join(st.as("b"), col("a.token") === col("b.token") &&
        col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("s1"), col("b.src").as("s2"))
      .agg(count(lit(1)).as("inter"))
    broadcast(sizes.select(col("src").as("s1"), col("nv").as("n1")))
      .crossJoin(broadcast(
        sizes.select(col("src").as("s2"), col("nv").as("n2"))))
      .filter(col("s1") < col("s2"))
      .join(inter, Seq("s1", "s2"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("union_nv", col("n1") + col("n2") - col("inter"))
      .select(col("s1"), col("s2"), col("inter"), col("union_nv"),
        expr("inter * 10000 div union_nv").as("jaccard_bp"))
  }

  /** Count of hits from a word list (quality scoring / language ID). */
  def wordHits(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(
      lower(text), lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  // Minimal distinctive stopword lists per language for the n-gram/
  // stopword language-ID heuristic. Deliberately small: the heuristic
  // is the operator; lists are a tunable.
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "los", "las", "es", "un", "una"))

  /** Stopword-hit language ID. Deterministic tie-break: languages are
    * tested in fixed order, `>=` comparisons, so equal scores resolve
    * to the earlier language; all-zero scores → "unknown".
    */
  def langId(text: Column): Column = {
    val langs = Seq("en", "de", "fr", "es")
    val hits = langs.map(l => l -> wordHits(text, stopwords(l))).toMap
    val best = langs.foldRight(lit("unknown")) { (l, els) =>
      val isMax = langs.filter(_ != l)
        .map(o => hits(l) >= hits(o))
        .reduce(_ && _) && hits(l) > 0
      when(isMax, lit(l)).otherwise(els)
    }
    best
  }

  /** Heuristic quality gate: integer-count thresholds only (exact on
    * both engines; no float ratios in the verdict path).
    */
  def qualityOk(text: Column,
      minTokens: Int = 10, maxPunctPerToken: Double = 0.5): Column =
    tokenCount(text) >= minTokens &&
      punctCount(text) * 2 <= tokenCount(text) // integer arithmetic form

  /** Token-window document chunking: split each document into
    * `chunkSize`-token windows advancing by `chunkSize - overlap`
    * tokens — the standard context-window prep for training corpora.
    * A trailing window is emitted only if it contributes tokens beyond
    * the previous window's coverage (`start + overlap < n`); an empty
    * document yields one empty chunk (chunk 0 always exists).
    *
    * Scale: the token array is materialized ONCE per document in the
    * projection under the explode (the per-chunk `slice` references
    * the attribute, it does not re-tokenize), so the pass is
    * shuffle-free and linear — output volume ≈ corpus × (1 +
    * overlap/stride).
    */
  def chunkTokens(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      chunkSize: Int = 40, overlap: Int = 10): org.apache.spark.sql.DataFrame = {
    require(overlap >= 0 && chunkSize > overlap,
      s"need chunkSize > overlap >= 0, got size=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val toks = tokens(col(textCol))
    val n = size(toks)
    val starts = filter(
      sequence(lit(0), greatest(n - 1, lit(0)), lit(stride)),
      s => s === 0 || (s + lit(overlap) < n))
    docs
      .select(col(idCol), toks.as("_toks"), n.as("_n"),
        explode(starts).as("_start"))
      .select(col(idCol),
        (col("_start") / stride).cast("long").as("chunk_idx"),
        array_join(slice(col("_toks"), col("_start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        least(lit(chunkSize), col("_n") - col("_start")).cast("long")
          .as("n_chunk_tokens"))
  }

  // PII-scrub patterns, restricted to the Java-regex ∩ RE2 subset
  // (no lookaround, no backreferences) so the DuckDB oracle evaluates
  // them identically. Deliberately high-recall shapes — a training-
  // data scrub prefers over-redaction to leakage.
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\b\\d{3}[-. ]\\d{3,4}[-. ]\\d{4}\\b"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII redaction: replace emails, phone-shaped numbers, and IPv4
    * addresses with typed placeholder tags. A pure chained
    * `regexp_replace` expression — codegen'd, shuffle-free,
    * linear over a 100 TB corpus; order matters (emails first, so an
    * address's digits are gone before the phone pass; IP last so
    * phone fragments don't half-match it).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        phonePattern, "<PHONE>"),
      ipv4Pattern, "<IP>")

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    * fraction of tokens belonging to duplicate occurrences — tokens
    * beyond the first occurrence of each distinct token — and the
    * fraction claimed by the single most frequent token. High values
    * flag degenerate/boilerplate documents that poison training data.
    *
    * One tokenize+explode pass, one (doc,term) aggregation, one
    * per-doc rollup — grouped shuffles only, no window over the
    * corpus, no driver involvement; ratios round(6) for
    * engine-identical hashing.
    */
  def repetitionSignals(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("tf")).as("top_tf"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round((col("n_tokens") - col("n_distinct")).cast("double") /
          col("n_tokens"), 6).as("dup_token_frac"),
        round(col("top_tf").cast("double") / col("n_tokens"), 6)
          .as("top_token_frac"))

  /** Character-distribution Shannon entropy (natural log), via the
    * shuffle-free native [[graft.functions.CharEntropy]] expression —
    * the degenerate-text quality signal: key-mash and repeated-char
    * padding score far below natural language. Deterministic: the
    * histogram folds in codepoint order.
    */
  def charEntropy(text: Column): Column =
    graft.functions.GraftFunctions.charEntropy(text)

  /** Content fingerprint: md5 of the UTF-8 bytes. For a 100 TB corpus
    * this is the exact-dedup key — group/bucket by `fingerprint` and
    * keep `min(doc_id)`.
    */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Winnowing fingerprint SET (rolling k-gram hash → sliding-window
    * minima, SIGMOD'03) via the native [[graft.functions.Winnow]]
    * expression: any shared byte run of length ≥ w+k−1 between two
    * documents yields a shared fingerprint — the selection sketch for
    * partial-overlap / plagiarism-style near-dup detection, where the
    * whole-document [[fingerprint]] only catches exact copies.
    */
  def winnowFingerprints(text: Column, k: Int = 25, w: Int = 50): Column =
    graft.functions.GraftFunctions.winnow(text, k, w)

  /** 64-bit rolling-hash-style fingerprint via xxhash64 (engine-local;
    * no cross-engine oracle — used by SimHash/MinHash pipelines).
    */
  def fingerprint64(text: Column): Column = xxhash64(text)

  /** Corpus card — the "datasheet for a dataset" one-call summary
    * (Gebru et al. 2021 motivation, counting form): corpus size,
    * source fan-out, token/char volume, exact-duplicate mass, empty
    * docs, and the language mix, as long-format `(metric, value)`
    * rows. Every metric is an EXACT integer (counts and integer
    * sums — no FP means), so the card is deterministic on any
    * layout/engine and diffable between snapshots (card(v17) vs
    * card(v18) is a two-frame join).
    *
    * ONE aggregation pass: the distinct-counts (sources,
    * fingerprints) expand through Spark's single Expand+aggregate
    * plan; everything else rides the same scan. Output is one bounded
    * row per metric.
    */
  def corpusCard(
      docs: org.apache.spark.sql.DataFrame,
      sourceCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val prepared = docs.select(
      col(sourceCol).as("__src"),
      length(col(textCol)).cast("long").as("__chars"),
      size(tokens(col(textCol))).cast("long").as("__ntok"),
      fingerprint(col(textCol)).as("__fp"),
      langId(col(textCol)).as("__lang"))
    val row = prepared.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("__src")).as("n_sources"),
      coalesce(sum(col("__ntok")), lit(0L)).as("total_tokens"),
      coalesce(sum(col("__chars")), lit(0L)).as("total_chars"),
      countDistinct(col("__fp")).as("n_distinct_texts"),
      count(when(col("__ntok") === 0, lit(1))).as("n_empty_docs"),
      count(when(col("__lang") === "en", lit(1))).as("n_docs_en"),
      count(when(col("__lang") === "de", lit(1))).as("n_docs_de"),
      count(when(col("__lang") === "fr", lit(1))).as("n_docs_fr"),
      count(when(col("__lang") === "es", lit(1))).as("n_docs_es"),
      count(when(col("__lang") === "unknown", lit(1)))
        .as("n_docs_unknown"))
    val metrics = Seq("n_docs", "n_sources", "total_tokens",
      "total_chars", "n_distinct_texts", "n_empty_docs", "n_docs_en",
      "n_docs_de", "n_docs_fr", "n_docs_es", "n_docs_unknown")
    row.select(explode(map(
        metrics.flatMap(m => Seq(lit(m), col(m))): _*))
      .as(Seq("metric", "value")))
  }

  /** Sub-document boilerplate removal (the CCNet line-dedup shape,
    * Wenzek et al. 2020): split every document into aligned
    * `segLen`-token segments, count how many DISTINCT documents each
    * exact segment occurs in across the corpus, delete segments
    * occurring in ≥ `minDocs` documents, and reassemble the survivors
    * in order. Catches shared headers/footers/navigation chrome that
    * document-level dedup can't see. (CCNet segments on newlines;
    * this corpus is single-line, so fixed token windows are the
    * segment unit — the aggregation algebra is identical.)
    *
    * Output: one row per input document — (idCol, clean_text,
    * n_kept_segments); a fully-boilerplate document survives with
    * empty text, so row count is stable for downstream audits.
    *
    * Scale: the frequency pass shuffles only (seg_hash, doc_id) —
    * column pruning drops the text before that exchange — and the
    * anti-join plus reassembly are keyed on the 8-byte hash and the
    * doc id respectively (same collision tolerance as every hash
    * join). The boilerplate key set is NOT assumed broadcastable: at
    * corpus scale "every segment shared by ≥2 of 10¹⁰ documents" can
    * be huge, so it stays a distributed anti-join (Catalyst
    * broadcasts it when it is in fact small). Worst-case segment text
    * therefore crosses the wire twice (hash-keyed anti-join, then
    * doc-keyed reassembly); on the common broadcast path, once.
    */
  def stripBoilerplate(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      segLen: Int = 10,
      minDocs: Int = 2): org.apache.spark.sql.DataFrame = {
    require(segLen > 0 && minDocs > 1,
      s"need segLen > 0 and minDocs > 1, got $segLen/$minDocs")
    val segs = chunkTokens(docs, idCol, textCol,
        chunkSize = segLen, overlap = 0)
      // chunkTokens emits chunk 0 even for a zero-token document; a
      // non-empty segment always carries ≥1 token, so dropping the
      // empty chunk_text exactly removes that phantom segment —
      // zero-token docs then surface as ("", 0) rows via the final
      // left join, matching the oracle's zero-segment comprehension
      .filter(col("chunk_text") =!= lit(""))
      .select(col(idCol), col("chunk_idx"), col("chunk_text"),
        xxhash64(col("chunk_text")).as("seg_hash"))
      // two plan branches read the segments (the frequency pass and
      // the anti-join probe side) — without the persist the chunk
      // explode over the corpus text runs twice (caller/session owns
      // clearCache, the tfidf/bm25 contract)
      .persist()
    val boiler = segs
      .groupBy(col("seg_hash"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("seg_hash"))
    val kept = segs.join(boiler, Seq("seg_hash"), "left_anti")
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text"))))
          .as("a"),
        count(lit(1)).as("n_kept"))
      .select(col(idCol),
        array_join(transform(col("a"), s => s("chunk_text")), " ")
          .as("clean_text"),
        col("n_kept"))
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept_segments"))
  }
}

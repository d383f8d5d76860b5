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
    * pipelines; two hash aggregations (term-per-doc, doc-freq) plus a
    * broadcast of the scalar corpus size — no driver-side collection.
    */
  def tfidf(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = toks.select("doc_id", "term").distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(total))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .select("doc_id", "term", "tf", "df", "tfidf")
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
  def winnowFingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    graft.functions.GraftFunctions.winnow(text, k, w)

  /** 64-bit rolling-hash-style fingerprint via xxhash64 (engine-local;
    * no cross-engine oracle — used by SimHash/MinHash pipelines).
    */
  def fingerprint64(text: Column): Column = xxhash64(text)
}

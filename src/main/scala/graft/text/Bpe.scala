package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding vocabulary induction and application.
  *
  * The reference pipeline counts whitespace tokens; a training-data
  * engine also needs the tokenizer itself — learning a subword vocab
  * over the corpus and segmenting text with it. The algorithm is the
  * public Sennrich et al. 2016 shape (arXiv:1508.07909): BPE training
  * operates on the WORD-TYPE frequency table, not the corpus, so the
  * 100 TB scale story is exact:
  *
  *  - the only distributed work is one tokenize+explode+groupBy pass
  *    (one shuffle, map-side partial counts) followed by a distributed
  *    top-k (`TakeOrdered`) down to `maxWordTypes` rows — the driver
  *    never sees more than that many (word, count) pairs no matter the
  *    corpus size. Capping to the most frequent word types is standard
  *    practice (rare types contribute ~nothing to merge counts);
  *  - the merge loop is inherently sequential-global (each merge
  *    changes the pair statistics the next merge ranks on), so it runs
  *    on the driver over the bounded table — the same division FAISS
  *    uses for IVF training (bounded sample in, index out; see
  *    [[graft.similarity.Ivf]]).
  *
  * Everything is deterministic: ties in pair frequency break on the
  * lexicographically smaller pair, so the merge sequence is a pure
  * function of the word-count table (pinned against a naive
  * sequential reference and a committed sf0.01 golden in BpeSpec).
  */
object Bpe {

  /** End-of-word marker (the classic `</w>`): lets the vocab
    * distinguish "est" in "estimate" from "est" ending "smallest".
    */
  val EndOfWord = "</w>"

  /** Initial symbol split — CODEPOINTS, not UTF-16 chars: a
    * `word.map(_.toString)` split would cut surrogate pairs (emoji,
    * supplementary CJK) into lone-surrogate "symbols" that are not
    * valid strings — UTF8String.fromString replaces them in the
    * expression path, silently corrupting non-BMP text.
    */
  private[text] def symbols(word: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += EndOfWord
    out.toArray
  }

  /** Learn `numMerges` BPE merges from the corpus. One shuffle
    * (word-type counts) + one distributed top-k; the merge loop is
    * driver-side over ≤ `maxWordTypes` rows. Text is lowercased and
    * tokenized on whitespace runs (the same `\S+` rule as
    * [[TextOps.tokens]]) so the vocab composes with the rest of the
    * text stack. Lowercasing here uses Spark's `lower()` while
    * [[Codec.encodeText]] uses `Locale.ROOT` — BpeSpec's locale probe
    * asserts the two rules agree in this environment, so a
    * locale-sensitive divergence (Turkish dotted I et al.) fails CI
    * loudly instead of drifting goldens.
    */
  def learnBpe(
      docs: DataFrame,
      textCol: Column,
      numMerges: Int,
      maxWordTypes: Int = 50000): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(maxWordTypes > 0,
      s"maxWordTypes must be positive, got $maxWordTypes")
    val wordCounts = docs
      .select(explode(TextOps.tokens(lower(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      // deterministic top-k: count desc, then word asc — TakeOrdered,
      // so the full vocab never reaches the driver
      .orderBy(desc("cnt"), asc("w")).limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    learn(wordCounts, numMerges)
  }

  /** The merge table as a DataFrame for persistence / inspection:
    * (rank, left, right, merged).
    */
  def vocabDf(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    val rows = merges.zipWithIndex.map { case ((a, b), i) =>
      Row(i, a, b, a + b)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("merged", StringType, nullable = false))))
  }

  /** Driver-side merge loop with incremental pair statistics (the
    * subword-nmt optimization): each merge re-touches only the words
    * that actually contain the merged pair (tracked by an inverted
    * index), not the whole table — O(affected symbols) per merge
    * instead of O(total symbols).
    */
  def learn(
      wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    val words: Array[Array[String]] =
      wordCounts.map { case (w, _) => symbols(w) }.toArray
    val counts: Array[Long] = wordCounts.map(_._2).toArray

    val stats = mutable.HashMap.empty[(String, String), Long]
    // pair -> word ids that contained it when last counted; entries go
    // stale after merges touch a word, so membership is re-checked
    // against the live word before use (subword-nmt does the same)
    val index = mutable.HashMap.empty[(String, String), mutable.Set[Int]]

    def countWord(i: Int, sign: Long): Unit = {
      val w = words(i); var j = 0
      while (j < w.length - 1) {
        val p = (w(j), w(j + 1))
        val n = stats.getOrElse(p, 0L) + sign * counts(i)
        if (n == 0L) stats.remove(p) else stats.update(p, n)
        if (sign > 0L) index.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
    }
    words.indices.foreach(countWord(_, 1L))

    // greedy left-to-right single-pair merge — the BPE standard (an
    // "a a a" word under merge (a,a) becomes "aa a", not "a aa")
    def mergeWord(w: Array[String], a: String, b: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]; var j = 0
      while (j < w.length) {
        if (j < w.length - 1 && w(j) == a && w(j + 1) == b) {
          out += (a + b); j += 2
        } else { out += w(j); j += 1 }
      }
      out.toArray
    }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      // deterministic argmax: count desc, then pair asc — a strict
      // total order, so hash-map iteration order cannot leak through
      var best: (String, String) = null
      var bestN = 0L
      stats.foreach { case (p, n) =>
        if (n > bestN || (n == bestN && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestN = n
        }
      }
      if (best == null) done = true
      else {
        val (a, b) = best
        val affected = index.getOrElse(best, mutable.Set.empty).toArray.sorted
        var k = 0
        while (k < affected.length) {
          val i = affected(k)
          val w = words(i)
          var has = false; var j = 0
          while (!has && j < w.length - 1) {
            has = w(j) == a && w(j + 1) == b; j += 1
          }
          if (has) {
            countWord(i, -1L)
            words(i) = mergeWord(w, a, b)
            countWord(i, 1L)
          }
          k += 1
        }
        stats.remove(best); index.remove(best)
        merges += best
        m += 1
      }
    }
    merges.toSeq
  }

  /** Immutable, serializable segmenter over a learned merge table.
    * Rides into executors as an expression field and into generated
    * code via `addReferenceObj` (see `BpeTokens` in GraftFunctions) —
    * the same pattern as the MinHash parameter arrays.
    */
  final class Codec(val merges: Seq[(String, String)]) extends Serializable {
    // earliest-wins: a pair can re-form during training (merge (a,b)
    // can create fresh (ab,c) adjacencies after (ab,c) was already
    // merged) and be selected a second time, so `merges` may contain
    // duplicates; keeping the LOWEST rank per pair makes the greedy
    // lowest-rank encode below replay the training order exactly —
    // `.toMap` alone would keep the last (highest) rank and let an
    // intermediate-rank merge jump the queue
    private val rank: Map[(String, String), Int] =
      merges.zipWithIndex.foldLeft(Map.empty[(String, String), Int]) {
        case (m, (p, i)) => if (m.contains(p)) m else m.updated(p, i)
      }

    /** Segment one word: start from characters + `</w>`, repeatedly
      * apply the LOWEST-RANK applicable merge (greedy left-to-right
      * within a rank) until none applies — the standard BPE encode.
      */
    def encodeWord(word: String): Array[String] = {
      var syms: Array[String] = symbols(word)
      var continue = syms.length > 1
      while (continue) {
        var bestRank = Int.MaxValue; var j = 0
        while (j < syms.length - 1) {
          val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
          if (r < bestRank) bestRank = r
          j += 1
        }
        if (bestRank == Int.MaxValue) continue = false
        else {
          val (a, b) = merges(bestRank)
          val out = mutable.ArrayBuffer.empty[String]; var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toArray
          continue = syms.length > 1
        }
      }
      syms
    }

    /** Tokenize text (lowercase, `\S+` words — the [[TextOps.tokens]]
      * rule) and concatenate per-word segmentations.
      */
    def encodeText(text: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      val m = WordRe.matcher(text.toLowerCase(java.util.Locale.ROOT))
      while (m.find()) out ++= encodeWord(m.group())
      out.toArray
    }
  }

  private val WordRe = java.util.regex.Pattern.compile("\\S+")
}

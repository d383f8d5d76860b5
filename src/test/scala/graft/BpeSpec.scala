package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** BPE vocabulary induction, pinned three ways (the pattern the
  * stripBoilerplate and packing pins established):
  *
  *  1. model test — [[Bpe.learn]]'s incremental-statistics loop against
  *     a naive recount-everything sequential reference on randomized
  *     word-count tables (the references differ exactly where an
  *     incremental-update bug would hide);
  *  2. algebraic properties — encode is lossless and reproduces the
  *     training segmentation; distributed induction is
  *     layout-independent;
  *  3. committed sf0.01 goldens for the two no-DuckDB-oracle queries
  *     (string-safe TSV — tokens are `\S+` runs, so tab never occurs
  *     in a symbol).
  */
class BpeSpec extends SparkTestBase {

  /** Naive reference: recount ALL pair statistics from scratch every
    * iteration, merge with the same (count desc, pair asc) argmax.
    * O(merges × corpus symbols) — correct by inspection, too slow for
    * production, perfect as an oracle.
    */
  private def naiveLearn(
      wordCounts: Seq[(String, Long)],
      numMerges: Int): (Seq[(String, String)], Seq[(Vector[String], Long)]) = {
    var words: Seq[(Vector[String], Long)] = wordCounts.map { case (w, c) =>
      // codepoint split + marker, same initial alphabet as Bpe.learn
      (w.codePoints().toArray.toVector
        .map(cp => new String(Character.toChars(cp))) :+ Bpe.EndOfWord, c)
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      val stats = mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; j <- 0 until syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        stats.update(p, stats.getOrElse(p, 0L) + c)
      }
      if (stats.isEmpty) done = true
      else {
        val best = stats.keys.toSeq
          .minBy { case (a, b) => (-stats((a, b)), a, b) }
        words = words.map { case (syms, c) =>
          val out = mutable.ArrayBuffer.empty[String]; var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 &&
                syms(j + 1) == best._2) { out += (best._1 + best._2); j += 2 }
            else { out += syms(j); j += 1 }
          }
          (out.toVector, c)
        }
        merges += best
        m += 1
      }
    }
    (merges.toSeq, words)
  }

  test("learn matches the naive sequential reference on random corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 25) {
      val nWords = 20 + rnd.nextInt(50)
      val words = (0 until nWords).map { _ =>
        val len = 1 + rnd.nextInt(9)
        (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      }.distinct
      val wc = words.map(w => w -> (1L + rnd.nextInt(50)))
      val numMerges = 1 + rnd.nextInt(60)
      val got = Bpe.learn(wc, numMerges)
      val want = naiveLearn(wc, numMerges)._1
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("encode is lossless and reproduces the training segmentation") {
    val rnd = new scala.util.Random(7)
    val words = (0 until 60).map { _ =>
      val len = 1 + rnd.nextInt(10)
      (0 until len).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    }.distinct
    val wc = words.map(w => w -> (1L + rnd.nextInt(30)))
    val (merges, trained) = naiveLearn(wc, 40)
    val codec = new Bpe.Codec(merges)
    for (((w, _), (syms, _)) <- wc.zip(trained)) {
      val enc = codec.encodeWord(w).toVector
      // lossless: concatenation restores the word + marker
      assert(enc.mkString == w + Bpe.EndOfWord, s"lossy encode of '$w'")
      // faithful: encode-time greedy == train-time evolution
      assert(enc == syms, s"'$w': encoded $enc but trained to $syms")
    }
  }

  test("non-BMP text survives both the codec and the expression path") {
    import spark.implicits._
    // emoji + supplementary CJK are surrogate PAIRS in UTF-16: a
    // char-level symbol split would cut them into lone surrogates,
    // which UTF8String silently replaces — symbols() splits codepoints
    val nasty = "café 😀😀naïve 𤭢 ab"
    val codec = new Bpe.Codec(Bpe.learn(
      Seq("café" -> 5L, "😀😀naïve" -> 3L,
        "𤭢" -> 2L, "ab" -> 8L), 6))
    val viaCodec = codec.encodeText(nasty).toSeq
    // lossless: concatenation restores the lowercased words + markers
    assert(viaCodec.mkString ==
      nasty.toLowerCase(java.util.Locale.ROOT).split(' ')
        .map(_ + Bpe.EndOfWord).mkString)
    // every symbol is a VALID string (no lone surrogates — a char
    // split would leave codepoints in the D800–DFFF surrogate range)
    assert(viaCodec.forall(s =>
      s.codePoints().toArray.forall(cp => cp < 0xD800 || cp > 0xDFFF)))
    val viaExpr = Seq(Tuple1(nasty)).toDF("text")
      .select(graft.functions.GraftFunctions.bpeTokens(col("text"), codec))
      .as[Seq[String]].head()
    assert(viaExpr == viaCodec, "expression path corrupted non-BMP symbols")
  }

  test("learn-side lower() and apply-side Locale.ROOT lowercase agree") {
    import spark.implicits._
    // learnBpe lowercases with Spark's lower(); Codec.encodeText with
    // String.toLowerCase(Locale.ROOT). If the two rules ever diverge in
    // this environment (e.g. a locale-sensitive JVM path on dotted/
    // dotless I under a Turkish default locale), learn-time and
    // apply-time tokenizations split and goldens drift silently — this
    // probe makes that failure loud in CI instead
    val probes = Seq(
      "İstanbul ISTANBUL ıı", // Turkish dotted/dotless I, the classic
      "ΣΑΣ ΟΔΟΣ",            // Greek final sigma
      "STRASSE ß",           // sharp s
      "ﬃ ﬆ",                 // ligatures
      "CAFÉ NAÏVE À 𤭢 😀")  // accents + non-BMP
    val viaSpark = probes.toDF("t").select(lower(col("t")))
      .as[String].collect().toSeq
    val viaRoot = probes.map(_.toLowerCase(java.util.Locale.ROOT))
    assert(viaSpark == viaRoot,
      s"Spark lower() diverged from Locale.ROOT: ${
        viaSpark.zip(viaRoot).filter(p => p._1 != p._2)}")
  }

  test("learnBpe is deterministic and layout-independent") {
    val docs = Tables.load(spark, sfDir, "documents")
    val m1 = Bpe.learnBpe(docs, col("text"), numMerges = 32,
      maxWordTypes = 5000)
    val m2 = Bpe.learnBpe(docs.repartition(13), col("text"), numMerges = 32,
      maxWordTypes = 5000)
    assert(m1 == m2, "merge sequence depends on layout")
    assert(m1.size == 32)
  }

  test("BpeTokens expression agrees with the driver-side codec") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents").limit(50)
    val codec = new Bpe.Codec(
      Bpe.learnBpe(Tables.load(spark, sfDir, "documents"), col("text"),
        numMerges = 24, maxWordTypes = 5000))
    val viaExpr = docs
      .select(col("doc_id"),
        graft.functions.GraftFunctions.bpeTokens(col("text"), codec)
          .as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val viaDriver = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
      .view.mapValues(t => codec.encodeText(t).toSeq).toMap
    assert(viaExpr == viaDriver)
  }

  // committed sf0.01 goldens for the no-oracle queries — shared TSV
  // mechanism in SparkTestBase
  test("q_bpe_vocab matches its committed sf0.01 golden output") {
    checkGoldenTsv("q_bpe_vocab")
  }
  test("q_doc_bpe_apply matches its committed sf0.01 golden output") {
    checkGoldenTsv("q_doc_bpe_apply")
  }
}

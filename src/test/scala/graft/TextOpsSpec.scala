package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("oovRate: top-k vocab, deterministic ties, empty docs keep 0s") {
    // corpus counts: "a"x4, "b"x3, "c"x2, "d"x2, "e"x1 → vocab(3) =
    // {a, b, c} (c beats d on the token-asc tie-break)
    val df = Seq(
      (1L, "a a b c d"),     // oov: d          → 1/5
      (2L, "a b c d e"),     // oov: d, e       → 2/5
      (3L, "a b a"),         // oov: none       → 0/3
      (4L, ""))              // no tokens       → 0/0
      .toDF("doc_id", "text")
    val got = TextOps.oovRate(df, col("doc_id"), col("text"), 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 5L, 1L, 2000L), (2L, 5L, 2L, 4000L),
      (3L, 3L, 0L, 0L), (4L, 0L, 0L, 0L)))
  }

  test("sourceVocabOverlap: hand-checked Jaccard, zero pairs kept") {
    val docs = Seq(
      ("s1", "a b c"), ("s2", "b c d"), ("s3", "x"))
      .toDF("source", "text")
    val got = TextOps.sourceVocabOverlap(docs, col("source"), col("text"))
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("s1", "s2", 2L, 4L, 5000L),
      ("s1", "s3", 0L, 4L, 0L),
      ("s2", "s3", 0L, 4L, 0L)))
  }

  test("token/char/punct counts on edge cases") {
    val df = Seq(
      (1L, "one two  three"),   // double space
      (2L, ""),                 // empty
      (3L, "  leading trailing  "),
      (4L, "a,b.c!?"))
      .toDF("id", "text")
    val got = df.select(col("id"),
      TextOps.tokenCount(col("text")).as("t"),
      TextOps.punctCount(col("text")).as("p"))
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((3, 0)))
    assert(got(2L) == ((0, 0)))
    assert(got(3L) == ((2, 0)))
    assert(got(4L) == ((1, 4)))
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der Hund und die Katze ist ein Tier"),
      (3L, "xyzzy qwerty"))
      .toDF("id", "text")
    val got = df.select(col("id"), TextOps.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "unknown"))
  }

  test("fingerprint is md5 of utf-8 bytes") {
    val got = Seq("abc").toDF("text")
      .select(TextOps.fingerprint(col("text"))).as[String].head()
    assert(got == "900150983cd24fb0d6963f7d28e17f72")
  }

  test("qualityOk thresholds") {
    val df = Seq(
      (1L, "w w w w w w w w w w"),        // 10 tokens, 0 punct → ok
      (2L, "short doc"),                  // 2 tokens → fail
      (3L, "a, b, c, d, e, f, g, h, i, j,")) // 10 tokens, 10 punct → fail
      .toDF("id", "text")
    val got = df.select(col("id"), TextOps.qualityOk(col("text")).as("q"))
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("winnow: matches a direct reimplementation and is order-stable") {
    val text = "the quick brown fox jumps over the lazy dog"
    val df = Seq((1L, text)).toDF("id", "text")
    val got = df.select(TextOps.winnowFingerprints(col("text"), 5, 4).as("fp"))
      .as[Seq[Long]].head()
    val bytes = text.getBytes("UTF-8")
    val want = graft.functions.Winnow.windowMins(
      graft.functions.Winnow.gramHashes(bytes, 5), 4).toSeq
    assert(got == want)
    assert(got == got.sorted && got.distinct == got, "sorted distinct set")
  }

  test("winnow guarantee: docs sharing a ≥ w+k−1 byte run share a fingerprint") {
    val shared = "0123456789abcdefghij" // 20 bytes ≥ 5+4−1
    val df = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"completely different start $shared and end"),
      (3L, "no overlap at all here")).toDF("id", "text")
    val fps = df.select(col("id"),
      TextOps.winnowFingerprints(col("text"), 5, 4).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert((fps(1L).toSet & fps(2L).toSet).nonEmpty,
      "shared substring must yield a shared fingerprint")
    assert((fps(1L).toSet & fps(3L).toSet).isEmpty,
      "disjoint content should share nothing at this scale")
  }

  test("winnow short/empty documents degrade to a single fingerprint") {
    val df = Seq((1L, "ab"), (2L, "")).toDF("id", "text")
    val got = df.select(col("id"),
      TextOps.winnowFingerprints(col("text"), 5, 4).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L).length == 1)
    assert(got(2L).length == 1)
  }

  test("chunkTokens windows cover the doc and reconstruct the stream") {
    val doc = (1 to 95).map(i => s"t$i").mkString(" ") // 95 tokens
    val df = Seq((1L, doc), (2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val got = TextOps.chunkTokens(df, "doc_id", "text", 40, 10)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    // doc 1: starts 0,30,60 (start 90 contributes nothing beyond 90+10)
    val c1 = got(1L)
    assert(c1.map(_._2).toSeq == Seq(0L, 1L, 2L))
    assert(c1.map(_._4).toSeq == Seq(40L, 40L, 35L))
    // stitching with the 10-token overlap dropped reconstructs the doc
    val stitched = (c1.head._3 +: c1.tail.map(
      _._3.split(' ').drop(10).mkString(" "))).mkString(" ")
    assert(stitched == doc)
    // every consecutive pair shares exactly the overlap
    c1.sliding(2).foreach { case Array(a, b) =>
      assert(a._3.split(' ').takeRight(10).toSeq ==
        b._3.split(' ').take(10).toSeq)
    }
    // short doc: single whole-doc chunk; empty doc: one empty chunk
    assert(got(2L).toSeq == Seq((2L, 0L, "a b c", 3L)))
    assert(got(3L).toSeq == Seq((3L, 0L, "", 0L)))
  }

  test("redactPii scrubs emails, phones, IPs; leaves near-misses alone") {
    val df = Seq(
      (1L, "mail a.b-c@x.co.uk and d%e@y.io, call 555-123-4567, " +
        "host 192.168.0.1"),
      (2L, "not-pii: version 1234.5.6.7, plain 555 1234, at@ sign"),
      (3L, "dotted phone 800.555.1234 0100 then 10.0.0.255 ends"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      graft.text.TextOps.redactPii(col("text")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "mail <EMAIL> and <EMAIL>, call <PHONE>, host <IP>")
    // 1234.5.6.7 has a 4-digit first octet (no \b match inside the
    // run); "555 1234" lacks a third group; "at@ sign" has no domain
    assert(got(2L) == "not-pii: version 1234.5.6.7, plain 555 1234, at@ sign")
    // dot-separated phone wins over the would-be-IP reading because
    // the phone pass runs first; trailing real IP still caught
    assert(got(3L) == "dotted phone <PHONE> 0100 then <IP> ends")
  }

  test("repetitionSignals: duplicate-token and top-token fractions") {
    val df = Seq(
      (1L, "a a a b"),          // 4 tokens, 2 distinct, top 3
      (2L, "x y z"),            // no repetition
      (3L, "The the THE"))      // case-folds to one term
      .toDF("doc_id", "text")
    val got = graft.text.TextOps.repetitionSignals(df, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((4L, 0.5, 0.75)))
    assert(got(2L) == ((3L, 0.0, 0.333333)))   // round(1/3, 6)
    assert(got(3L) == ((3L, 0.666667, 1.0)))   // round(2/3, 6)
  }

  test("bm25Search ranks by summed term weights, k-bounded, tie-broken") {
    // doc 1: both query terms, high tf; doc 2: one term; doc 3: none;
    // doc 4: both terms once — expect 1 > 4 > 2, doc 3 absent
    val docs = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana date date date"),
      (3L, "egg fig grape"),
      (4L, "apple banana egg fig")).toDF("doc_id", "text")
    val queries = Seq(("qA", "apple banana"), ("qB", "egg"))
      .toDF("qid", "qtext")
    val got = TextOps.bm25Search(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 2)
      .select("qid", "rank", "doc_id").as[(String, Int, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.map(r => (r._1, r._3)).toSeq ==
      Seq(("qA", 1L), ("qA", 4L), ("qB", 3L), ("qB", 4L)))
    // k bounds output even when more docs match
    assert(got.count(_._1 == "qA") == 2)
    // repeated query terms count once: identical ranking for "egg egg"
    val rep = TextOps.bm25Search(docs, "doc_id", "text",
        Seq(("qB", "egg egg")).toDF("qid", "qtext"), "qid", "qtext", k = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(rep == Set(3L, 4L))
  }

  test("rm3Search expands the query through feedback-doc vocabulary") {
    // "apple" retrieves docs 1 and 2; both carry "cider", which doc 3
    // shares EXCLUSIVELY — plain BM25 can never return doc 3 for
    // "apple" (no term overlap), RM3's expansion must
    val docs = Seq(
      (1L, "apple cider apple"),
      (2L, "apple cider press"),
      (3L, "cider barrel cellar"),
      (4L, "grape wine cellar")).toDF("doc_id", "text")
    val queries = Seq(("qA", "apple")).toDF("qid", "qtext")
    val plain = TextOps.bm25Search(docs, "doc_id", "text",
        queries, "qid", "qtext", k = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(plain == Set(1L, 2L), s"BM25 control leaked: $plain")
    val rm3 = TextOps.rm3Search(docs, "doc_id", "text",
        queries, "qid", "qtext", fbDocs = 2, fbTerms = 3, k = 4)
      .select("qid", "rank", "doc_id").as[(String, Int, Long)]
      .collect().sortBy(_._2)
    assert(rm3.map(_._3).contains(3L),
      s"expansion failed to reach the no-overlap doc: ${rm3.toSeq}")
    // original-term anchoring: the apple-bearing docs still lead
    assert(rm3.take(2).map(_._3).toSet == Set(1L, 2L), rm3.toSeq.toString)
    // layout independence
    val rm3b = TextOps.rm3Search(docs.repartition(5), "doc_id", "text",
        queries, "qid", "qtext", fbDocs = 2, fbTerms = 3, k = 4)
      .select("qid", "rank", "doc_id").as[(String, Int, Long)]
      .collect().sortBy(_._2)
    assert(rm3b.toSeq == rm3.toSeq, "RM3 depends on layout")
  }

  test("stripBoilerplate removes shared segments, keeps order, keeps rows") {
    // segLen=3: docs 1 and 2 share their FIRST 3-token segment exactly;
    // remaining segments are unique
    val df = Seq(
      (1L, "nav home about x y z"),     // segs: "nav home about", "x y z"
      (2L, "nav home about p q r"),     // segs: "nav home about", "p q r"
      (3L, "entirely unique doc here"), // segs: "entirely unique doc", "here"
      (4L, "nav home about"),           // single seg, fully boilerplate
      (5L, "   "))                      // zero tokens → no segments at all
      .toDF("doc_id", "text")
    val got = graft.text.TextOps
      .stripBoilerplate(df, "doc_id", "text", segLen = 3, minDocs = 2)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == (("x y z", 1L)))
    assert(got(2L) == (("p q r", 1L)))
    assert(got(3L) == (("entirely unique doc here", 2L)))
    assert(got(4L) == (("", 0L)))            // row survives with empty text
    // a zero-token doc contributes NO segment (the oracle's empty
    // comprehension), not a phantom "" segment — and still keeps its row
    assert(got(5L) == (("", 0L)))
    assert(got.size == 5)
  }

  test("stripBoilerplate matches a sequential model on randomized corpora") {
    // tiny vocabulary forces segment collisions; the model re-derives
    // the aligned-chunk + distinct-doc-frequency + in-order-reassembly
    // semantics independently of the DataFrame implementation
    val vocab = Vector("a", "b", "c")
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val segLen = 2 + rnd.nextInt(2) // 2 or 3
      val docs = (0L until 30L).map { i =>
        val n = rnd.nextInt(10) // 0..9 tokens — includes empty docs
        (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // model
      def segsOf(text: String): Seq[String] = {
        val toks = text.split("\\s+").filter(_.nonEmpty)
        toks.grouped(segLen).map(_.mkString(" ")).toSeq
      }
      val freq = docs.flatMap { case (id, t) => segsOf(t).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }
      val expected = docs.map { case (id, t) =>
        val kept = segsOf(t).filter(s => freq(s) < 2)
        id -> ((kept.mkString(" "), kept.size.toLong))
      }.toMap
      // engine
      val got = graft.text.TextOps.stripBoilerplate(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        segLen = segLen, minDocs = 2)
        .as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == expected,
        s"segLen=$segLen diff: ${(got.toSet -- expected.toSet).take(3)} vs " +
          s"${(expected.toSet -- got.toSet).take(3)}")
    }
  }

  test("corpusCard counts a hand-checked corpus exactly") {
    val df = Seq(
      ("web", 1L, "the cat and the dog"),   // en, 5 tokens
      ("web", 2L, "the cat and the dog"),   // exact dup of doc 1
      ("books", 3L, "der hund ist ein tier"), // de, 5 tokens
      ("books", 4L, ""),                    // empty
      ("web", 5L, "zzz qqq"))               // unknown, 2 tokens
      .toDF("source", "doc_id", "text")
    val card = graft.text.TextOps.corpusCard(df, "source", "text")
      .as[(String, Long)].collect().toMap
    assert(card == Map(
      "n_docs" -> 5L, "n_sources" -> 2L,
      "total_tokens" -> 17L, "total_chars" -> 66L, // dup doc counts too
      "n_distinct_texts" -> 4L, "n_empty_docs" -> 1L,
      "n_docs_en" -> 2L, "n_docs_de" -> 1L, "n_docs_fr" -> 0L,
      "n_docs_es" -> 0L, "n_docs_unknown" -> 2L), s"card: $card")
  }

  test("stripBoilerplate segment order is chunk order, not lexicographic") {
    val df = Seq(
      (1L, "zz yy xx aa bb cc"),          // segs "zz yy xx", "aa bb cc"
      (2L, "shared seg one two three four"),
      (3L, "lone"))
      .toDF("doc_id", "text")
    val got = graft.text.TextOps
      .stripBoilerplate(df, "doc_id", "text", segLen = 3, minDocs = 2)
      .filter(col("doc_id") === 1L)
      .as[(Long, String, Long)].head()
    assert(got._2 == "zz yy xx aa bb cc")
  }
}

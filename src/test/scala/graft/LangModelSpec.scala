package graft

import org.apache.spark.sql.functions._

import graft.text.LangModel

/** Bigram-LM scoring pinned the QualityModel way: a naive sequential
  * reference (recount everything in plain Scala, same smoothing, same
  * rounding discipline), layout independence of the exact-decimal
  * sums, and the count-pruning monotonicity the production path
  * relies on.
  */
class LangModelSpec extends SparkTestBase {
  import spark.implicits._

  /** Plain-Scala replay: same lowercase/\S+ tokens, add-half
    * smoothing, per-term round to 9 dp, exact decimal sum.
    */
  private def naiveScores(
      docs: Seq[(Long, String)]): Map[Long, (Long, Double, Option[Double])] = {
    def toks(t: String): Seq[String] =
      "\\S+".r.findAllIn(t.toLowerCase(java.util.Locale.ROOT)).toSeq
    val uni = docs.flatMap(d => toks(d._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = docs.flatMap(d => toks(d._2).sliding(2).filter(_.size == 2))
      .map(_.mkString(" "))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = uni.size.toDouble
    docs.map { case (id, t) =>
      val pairs = toks(t).sliding(2).filter(_.size == 2).toSeq
      val lps = pairs.map { p =>
        val b = p.mkString(" ")
        val raw = math.log(
          (bi.getOrElse(b, 0L) + 0.5) / (uni.getOrElse(p.head, 0L) + (0.5 * v)))
        // Spark round(x, 9): HALF_UP over the shortest decimal repr
        BigDecimal(java.math.BigDecimal.valueOf(raw)
          .setScale(9, java.math.RoundingMode.HALF_UP))
          .setScale(12)
      }
      val sum = lps.foldLeft(BigDecimal(0).setScale(12))(_ + _)
      // the engine's exact integer-space 9-dp HALF_UP mean:
      // k = (2|S9| + n) div (2n) with S9 = sum·10^9 (exact — the sum
      // is a 9-dp lattice value), score = ±k/10^9
      val score =
        if (pairs.isEmpty) None
        else {
          val s9 = (sum * BigDecimal(1000000000L)).toBigIntExact.get
          val n = BigInt(pairs.size)
          val k = (s9.abs * 2 + n) / (n * 2)
          Some((if (s9 < 0) -k else k).toDouble / 1.0e9)
        }
      // the emitted logp_sum is the exact 9-dp lattice sum as a
      // correctly-rounded double (the certified-surface rule: DECIMAL
      // accumulates, double emits)
      id -> ((pairs.size.toLong, sum.toDouble, score))
    }.toMap
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the fish"),
    (3L, "a dog sat on a log and the dog ate"),
    (4L, "one-token"),
    (5L, ""),
    (6L, "the the the the"))

  test("scoreDocs matches the naive sequential reference") {
    val docs = corpus.toDF("doc_id", "text")
    val lm = LangModel.train(docs, col("text"))
    val got = LangModel.scoreDocs(docs, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    val want = naiveScores(corpus)
    assert(got == want,
      s"diverged: ${got.toSeq.sortBy(_._1).zip(want.toSeq.sortBy(_._1))
        .filter(p => p._1 != p._2)}")
  }

  test("scores are layout-independent") {
    val docs = Tables.load(spark, sfDir, "documents")
    val lm1 = LangModel.train(docs, col("text"))
    val s1 = LangModel.scoreDocs(docs, "doc_id", "text", lm1)
      .collect().map(r => r.getLong(0) -> String.valueOf(r.get(2))).toMap
    val re = docs.repartition(13)
    val lm2 = LangModel.train(re, col("text"))
    val s2 = LangModel.scoreDocs(re, "doc_id", "text", lm2)
      .collect().map(r => r.getLong(0) -> String.valueOf(r.get(2))).toMap
    assert(s1 == s2, "logp sums depend on partitioning")
  }

  test("the LM persists and reloads through the table store") {
    // deployment loop: train offline → persist the count tables →
    // reload in the ingest job (the streaming LM gate's model source)
    import org.apache.spark.sql.types._
    val docs = corpus.toDF("doc_id", "text")
    val lm = LangModel.train(docs, col("text"))
    val store = new graft.streaming.TableStore(
      java.nio.file.Files.createTempDirectory("lm_store").toString)
    store.overwrite("lm_unigrams", lm.unigrams)
    store.overwrite("lm_bigrams", lm.bigrams)
    store.overwrite("lm_meta",
      Seq(lm.vocabSize).toDF("vocab_size"))
    val reloaded = LangModel.BigramLm(
      store.read(spark, "lm_unigrams", StructType(Seq(
        StructField("w", StringType), StructField("c_uni", LongType)))),
      store.read(spark, "lm_bigrams", StructType(Seq(
        StructField("b", StringType), StructField("c_bi", LongType)))),
      store.read(spark, "lm_meta", StructType(Seq(
        StructField("vocab_size", LongType)))).head().getLong(0))
    val direct = LangModel.scoreDocs(docs, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> String.valueOf(r.get(2))).toMap
    val fromStore = LangModel.scoreDocs(docs, "doc_id", "text", reloaded)
      .collect().map(r => r.getLong(0) -> String.valueOf(r.get(2))).toMap
    assert(fromStore == direct, "scores drifted through the store")
  }

  test("pruning only lowers scores, and min-count 1 is the identity") {
    val docs = Tables.load(spark, sfDir, "documents")
    val lm = LangModel.train(docs, col("text"))
    val exact = LangModel.scoreDocs(docs, "doc_id", "text", lm)
      .select("doc_id", "lm_score").as[(Long, Option[Double])]
      .collect().toMap
    val noop = LangModel.scoreDocs(docs, "doc_id", "text",
      LangModel.prune(lm, 1L))
      .select("doc_id", "lm_score").as[(Long, Option[Double])]
      .collect().toMap
    assert(noop == exact, "min-count 1 must not change anything")
    val pruned = LangModel.scoreDocs(docs, "doc_id", "text",
      LangModel.prune(lm, 3L))
      .select("doc_id", "lm_score").as[(Long, Option[Double])]
      .collect().toMap
    assert(pruned.keySet == exact.keySet)
    // a pruned pair falls to the smoothing floor, which is strictly
    // below any counted probability — per-doc means can only drop
    assert(exact.forall { case (id, e) =>
      (e, pruned(id)) match {
        case (Some(a), Some(b)) => b <= a + 1e-12
        case (None, None)       => true
        case _                  => false
      }
    }, "pruning raised a score")
    assert(exact.exists { case (id, e) =>
      (e, pruned(id)) match {
        case (Some(a), Some(b)) => b < a
        case _                  => false
      }
    }, "pruning at min-count 3 should bite on real data")
  }
}

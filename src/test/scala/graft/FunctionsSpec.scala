package graft

/** The native expressions exposed through spark.sql, registered by the
  * GraftExtensions SparkSessionExtensions installer configured on the
  * test session (spark.sql.extensions) — no register() call here.
  */
class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("simhash64 available via spark.sql.extensions") {
    assert(spark.sql("SELECT simhash64(array(3L, 1L, 1L)) v").as[Long].head() == 1L)
  }

  test("minhash_signature via SQL matches the column API") {
    val viaSql = spark.sql(
      "SELECT minhash_signature(array(1L, 2L, 3L), 8) v").as[Seq[Long]].head()
    val viaCol = Seq(Tuple1(Seq(1L, 2L, 3L))).toDF("a")
      .select(graft.functions.GraftFunctions
        .minhashSignature(org.apache.spark.sql.functions.col("a"), 8).as("v"))
      .as[Seq[Long]].head()
    assert(viaSql == viaCol && viaSql.length == 8)
  }

  test("vector_dot via SQL computes the left fold") {
    val got = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) v")
      .as[Double].head()
    assert(got == 32.0)
  }

  test("hyperplane_signatures: native batch expr is bit-identical to the " +
    "Column-composed single-table form") {
    import org.apache.spark.sql.functions.col
    val dim = 16; val bits = 6; val tables = 4
    val vecs = Seq.tabulate(20)(i =>
      Tuple1(Seq.tabulate(dim)(j => math.sin(i * 31 + j).toDouble)))
    val df = vecs.toDF("v")
    val batch = df.select(graft.functions.GraftFunctions
      .hyperplaneSignatures(col("v"), dim, bits, tables).as("s"))
      .as[Seq[Long]].collect()
    (0 until tables).foreach { t =>
      val single = df.select(graft.similarity.Knn
        .hyperplaneSignature(col("v"), dim, bits, seed = 7L + t).as("s"))
        .as[Long].collect()
      assert(batch.map(_(t)).toSeq == single.toSeq,
        s"table $t diverges from the Column-composed signature")
    }
  }

  test("arg_top_cells equals the struct-sort composition, incl. ties") {
    import org.apache.spark.sql.functions._
    val dim = 8
    val rnd = new scala.util.Random(5)
    val centroids = Seq.fill(16)(Array.fill(dim)(rnd.nextGaussian()))
    // random vectors plus exact-tie cases (zero vector → all dots 0;
    // a duplicated centroid direction; a NaN vector → all dots NaN,
    // which Spark's sort ranks ABOVE every double)
    val vecs = Seq.fill(30)(Seq.fill(dim)(rnd.nextGaussian())) ++
      Seq(Seq.fill(dim)(0.0), centroids.head.toSeq,
        Double.NaN +: Seq.fill(dim - 1)(1.0))
    val df = vecs.map(Tuple1(_)).toDF("v")
    val composed = df.select(
      slice(sort_array(array(centroids.zipWithIndex.map { case (c, i) =>
        struct(
          graft.similarity.Knn.dot(col("v"), typedlit(c.toSeq)).as("d"),
          lit(i).as("i"))
      }: _*), asc = false), 1, 3).as("s"))
      .select(transform(col("s"), s => s.getField("i")).as("cells"))
      .as[Seq[Int]].collect().toSeq
    val native = df.select(graft.functions.GraftFunctions
      .argTopCells(col("v"), centroids, 3).as("cells"))
      .as[Seq[Int]].collect().toSeq
    assert(native == composed)
  }

  test("winnow via SQL matches the direct implementation") {
    val got = spark.sql("SELECT winnow('abcdefghij', 3, 2) v").as[Seq[Long]].head()
    val want = graft.functions.Winnow.windowMins(
      graft.functions.Winnow.gramHashes("abcdefghij".getBytes("UTF-8"), 3), 2).toSeq
    assert(got == want)
  }

  test("char_entropy: hand values, +0.0 sign, unicode codepoints, null") {
    import graft.functions.CharEntropy
    assert(CharEntropy.eval("") == 0.0)
    // single class: exactly +0.0, not -0.0 (oracle parity)
    val z = CharEntropy.eval("aaaa")
    assert(z == 0.0 &&
      java.lang.Double.doubleToRawLongBits(z) == 0L)
    val ln2 = math.log(2)
    assert(math.abs(CharEntropy.eval("ab") - ln2) < 1e-15)
    assert(math.abs(CharEntropy.eval("aabb") - ln2) < 1e-15)
    // 4 distinct uniform → ln 4; surrogate-pair codepoint counts ONCE
    assert(math.abs(CharEntropy.eval("aé中😀") -
      math.log(4)) < 1e-15)
    // SQL registration + null propagation
    val got = spark.sql(
      "SELECT char_entropy('ab') e1, char_entropy(CAST(NULL AS STRING)) e2")
      .as[(Double, Option[Double])].head()
    assert(math.abs(got._1 - ln2) < 1e-15 && got._2.isEmpty)
  }

  test("nfc_normalize: composition, idempotence, passthrough identity, " +
      "SQL, null") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.NfcNormalize
    def ev(s: String): String =
      NfcNormalize.eval(UTF8String.fromString(s)).toString
    // e + combining acute (U+0301) composes to precomposed U+00E9;
    // explicit escapes so source-file encoding can never pre-normalize
    // the fixture
    val decomposed = "e\u0301cole"
    assert(decomposed.length == 6 && ev(decomposed) == "\u00e9cole"
      && ev(decomposed).length == 5)
    // idempotent, and an already-NFC input returns the SAME UTF8String
    // (the no-allocation fast path)
    assert(ev(ev(decomposed)) == ev(decomposed))
    val nfc = UTF8String.fromString("\u00e9cole \u4e2d\u6587 ok")
    assert(NfcNormalize.eval(nfc) eq nfc)
    // full cleanup composition matches the DuckDB oracle's form
    val cleaned = Seq(("  a\u0301  b\t\nc  ")).toDF("text")
      .select(graft.text.TextOps.normalizeText(col("text")))
      .as[String].head()
    assert(cleaned == "\u00e1 b c", s"got ${cleaned.toList}")
    // SQL registration + null propagation
    val got = spark.sql(
      "SELECT nfc_normalize('e\u0301') a, " +
        "nfc_normalize(CAST(NULL AS STRING)) b")
      .as[(String, Option[String])].head()
    assert(got._1 == "\u00e9" && got._2.isEmpty)
  }

  test("positional_shingle_hashes: order, bit-compat, short-doc, SQL, null") {
    import org.apache.spark.sql.functions._
    // element i == xxhash64 of the window starting at token i — the
    // composed-HOF form is the semantic reference
    val text = "alpha beta\tgamma  delta\nepsilon"
    val viaExpr = spark.sql(
      s"SELECT positional_shingle_hashes('$text', 3) v")
      .as[Seq[Long]].head()
    val viaHof = Seq(text).toDF("t").select(
      expr("transform(sequence(1, size(split(trim(t), '\\\\s+')) - 2), " +
        "i -> xxhash64(array_join(slice(split(trim(t), '\\\\s+'), i, 3), ' ')))")
        .as("v")).as[Seq[Long]].head()
    assert(viaExpr == viaHof, s"$viaExpr vs $viaHof")
    // sorted distinct of the positional form == shingle_hashes when
    // the document has at least n tokens
    val viaSet = spark.sql(s"SELECT shingle_hashes('$text', 3) v")
      .as[Seq[Long]].head()
    assert(viaExpr.distinct.sorted == viaSet.sorted)
    // below n tokens: positional has no anchor (EMPTY — shingle_hashes
    // falls back to the whole-text shingle instead); null propagates
    val (short, nul) = spark.sql(
      "SELECT positional_shingle_hashes('a b', 3) s, " +
        "positional_shingle_hashes(CAST(NULL AS STRING), 3) n")
      .as[(Seq[Long], Option[Seq[Long]])].head()
    assert(short.isEmpty && nul.isEmpty)
  }

  test("remove_token_spans equals the naive filter on random inputs") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 60) {
      val m = rnd.nextInt(30)
      val toks = (0 until m).map(i => s"t${rnd.nextInt(9)}x$i")
      val text = toks.mkString(
        Seq(" ", "  ", "\t", " \n ")(rnd.nextInt(4)))
      val k = 1 + rnd.nextInt(5)
      val starts = (0 until rnd.nextInt(6))
        .map(_ => rnd.nextInt(math.max(1, m))).distinct.sorted
      val naive = toks.zipWithIndex.collect {
        case (t, i) if !starts.exists(s => s <= i && i < s + k) => t
      }.mkString(" ")
      val got = Seq((text, starts)).toDF("t", "s")
        .select(graft.functions.GraftFunctions
          .removeTokenSpans(col("t"), col("s"), k).as("v"))
        .as[String].head()
      assert(got == naive, s"m=$m k=$k starts=$starts: '$got' vs '$naive'")
    }
    // SQL registration + null propagation
    val viaSql = spark.sql(
      "SELECT remove_token_spans('a b c d e', array(1), 2) v, " +
        "remove_token_spans(CAST(NULL AS STRING), array(1), 2) n")
      .as[(String, Option[String])].head()
    assert(viaSql == (("a d e", None)))
  }
}

package graft

/** DuckDB-SQL replay of [[graft.text.Bpe.learnBpe]] — the LAST
  * no-oracle query moved onto the hash-certified surface.
  *
  * BPE induction was long documented as replay-impossible ("iterative
  * merge induction with data-dependent tie-breaks"), but every step of
  * the loop is deterministic relational algebra once the iteration is
  * UNROLLED (the OracleAnn spherical-k-means precedent): each of the
  * `numMerges` rounds is pair-count aggregation → a total-order argmax
  * → a symbol-sequence rewrite, and none of it involves floating
  * point, so the replay is exact by construction:
  *
  *  - **word types** (`wc`): the engine's one distributed pass —
  *    `\S+` tokens of `lower(text)`, counted, top-`maxWordTypes` by
  *    (count desc, word asc). Both engines compare ASCII strings
  *    bytewise, so the deterministic top-k is order-identical.
  *  - **initial symbols** (`w0`): per-codepoint split + `</w>` —
  *    `regexp_extract_all(w, '.')` matches one codepoint per RE2
  *    rune, the same unit as `Bpe.symbols`' codePointAt walk.
  *  - **pair stats** (`p{i}`): adjacent-pair explosion via
  *    `UNNEST(generate_series(1, len(syms)-1))` — per OCCURRENCE, so
  *    an "a a a" word contributes (a,a) twice, exactly like
  *    `countWord`'s positional walk. (The engine maintains these
  *    stats incrementally through an inverted index; incremental
  *    maintenance ≡ recount because a merged pair never survives
  *    `mergeWord` and touched words fully re-register — so the oracle
  *    recounts from scratch each round.)
  *  - **argmax** (`b{i}`): `ORDER BY n DESC, a, b LIMIT 1` — the
  *    engine's strict total order (count desc, lexicographically
  *    smallest pair). Scala compares UTF-16 code units where DuckDB
  *    compares UTF-8 bytes; the orders agree on the corpus (ASCII —
  *    the same assumption the winnowing/xxhash64 oracles pin) and
  *    diverge only for code points beyond U+E000.
  *  - **merge rewrite** (`w{i+1}`): the greedy left-to-right
  *    single-pass pair merge IS string `replace` over a
  *    marker-delimited join of the symbols: each symbol is wrapped
  *    `\x02sym\x03`, the pair pattern `\x02a\x03\x02b\x03` can then
  *    only match whole adjacent symbols (no suffix/prefix false
  *    positives), and `replace`'s scan-past-the-replacement semantics
  *    reproduce `mergeWord`'s `j += 2` exactly — verified on the
  *    overlap cases ("a a a a" → "aa aa", "a a a" → "aa a"). The
  *    markers are non-whitespace controls that `\S+` words could in
  *    principle contain; the corpus is printable ASCII (checked), and
  *    a collision would surface as a loud verify red, never a silent
  *    pass.
  *
  * Every CTE is `MATERIALIZED`: `w{i}` is referenced twice per round
  * (stats + rewrite), so default inlining would expand the 64-round
  * chain exponentially; materialization keeps the replay linear
  * (64 rounds × ≤`maxWordTypes` rows, ~3 s at sf0.01).
  */
object OracleBpe {

  /** Left/right symbol delimiters for the merge-rewrite encoding —
    * STX/ETX, outside printable ASCII.
    */
  private val L = "chr(2)"
  private val R = "chr(3)"

  /** The full replay of `learnBpe(documents, text, numMerges,
    * maxWordTypes)` → (rank, left, right, merged), matching
    * [[graft.text.Bpe.vocabDf]] column for column.
    */
  def bpeVocabSql(numMerges: Int, maxWordTypes: Int): String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    parts += s"""wc AS MATERIALIZED (
      |  SELECT w, count(*) AS cnt FROM (
      |    SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS w
      |    FROM documents)
      |  GROUP BY w ORDER BY cnt DESC, w ASC LIMIT $maxWordTypes)""".stripMargin
    parts += s"""w0 AS MATERIALIZED (
      |  SELECT list_append(regexp_extract_all(w, '.'), '</w>') AS syms, cnt
      |  FROM wc)""".stripMargin
    for (i <- 0 until numMerges) {
      parts += s"""p$i AS MATERIALIZED (
        |  SELECT syms[t.g] AS a, syms[t.g+1] AS b, sum(cnt) AS n
        |  FROM w$i, UNNEST(generate_series(1, len(syms)-1)) AS t(g)
        |  GROUP BY 1, 2)""".stripMargin
      parts += s"""b$i AS MATERIALIZED (
        |  SELECT a, b, a||b AS m FROM p$i
        |  ORDER BY n DESC, a ASC, b ASC LIMIT 1)""".stripMargin
      if (i < numMerges - 1)
        parts += s"""w${i + 1} AS MATERIALIZED (
          |  SELECT CASE WHEN contains(wrap, pat)
          |    THEN string_split(substr(replace(wrap, pat, rep), 2,
          |         length(replace(wrap, pat, rep)) - 2), $R||$L)
          |    ELSE syms END AS syms, cnt
          |  FROM (SELECT syms, cnt,
          |          $L||array_to_string(syms, $R||$L)||$R AS wrap,
          |          $L||b$i.a||$R||$L||b$i.b||$R AS pat,
          |          $L||b$i.m||$R AS rep
          |        FROM w$i, b$i))""".stripMargin
    }
    val out = (0 until numMerges).map(i =>
      s"""SELECT CAST($i AS INTEGER) AS "rank", a AS "left",
         |  b AS "right", m AS merged FROM b$i""".stripMargin)
      .mkString("\n UNION ALL ")
    "WITH " + parts.mkString(",\n") + "\n" + out
  }
}

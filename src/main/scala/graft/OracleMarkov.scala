package graft

/** DuckDB replay of [[graft.ops.Attribution.markovAttribution]] for
  * q_markov_attribution — the removal-effect solve as generated SQL.
  *
  * The engine's solve is an `Iters`-step truncated absorption
  * fixpoint in exact integer arithmetic (10⁻⁹-scale values, one
  * floor division per state per step — the pageRankInt discipline),
  * so the oracle can replay it VERBATIM: the journey/transition
  * construction mirrors the operator's windows (same `(epoch_us,
  * event_id)` order the loader sees), and the iteration chain is
  * unrolled as `Iters` MATERIALIZED CTEs over the (variant, state)
  * value table — one variant for the full chain plus one per removed
  * channel, so all solves advance in lock-step in a single chain
  * (the kCore unrolled-CTE precedent; default inlining of a 60-deep
  * chain is what fd-exhausted the kCore oracle). All arithmetic runs
  * in HUGEINT; `//` floor-matches BigInt division on the nonnegative
  * values the monotone map produces.
  */
object OracleMarkov {

  /** Iteration count shared by the engine call and the oracle. */
  val Iters = 60

  val Touches: Seq[String] = Seq("click", "view", "signup")
  val Conversion = "purchase"

  private def step(i: Int): String =
    s"""v$i AS MATERIALIZED (
       |  SELECT b.rm, b.state,
       |    CASE WHEN coalesce(t.tot, 0) = 0 THEN 0::HUGEINT
       |      ELSE (coalesce(agg.sv, 0) + coalesce(cv.n, 0) * 1000000000)
       |        // t.tot
       |    END AS v
       |  FROM base b
       |  LEFT JOIN tot t ON t.src = b.state
       |  LEFT JOIN (
       |    SELECT pv.rm, c.src, sum(c.n * pv.v) AS sv
       |    FROM cnt c JOIN v${i - 1} pv
       |      ON pv.state = c.dst AND c.dst <> pv.rm
       |    GROUP BY 1, 2) agg ON agg.src = b.state AND agg.rm = b.rm
       |  LEFT JOIN (SELECT src, n FROM cnt WHERE dst = 'conv') cv
       |    ON cv.src = b.state)""".stripMargin

  val sql: String = {
    val touchList = Touches.map(t => s"'$t'").mkString(", ")
    val stVals = ("start" +: Touches).map(s => s"('$s')").mkString(",")
    val vrVals = ("" +: Touches).map(s => s"('$s')").mkString(",")
    val steps = (1 to Iters).map(step).mkString(",\n")
    s"""WITH rel AS MATERIALIZED (
       |  SELECT user_id AS u, epoch_us(ts) AS us, event_id AS id,
       |    event_type AS t
       |  FROM events
       |  WHERE event_type IN ($touchList, '$Conversion')
       |    AND user_id IS NOT NULL AND ts IS NOT NULL),
       |m AS (
       |  SELECT u, us, id, t,
       |    coalesce(sum(CASE WHEN t = '$Conversion' THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY u ORDER BY us, id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS j
       |  FROM rel),
       |s AS (
       |  SELECT t, j, lag(t) OVER w AS pt, lag(j) OVER w AS pj,
       |    lead(t) OVER w AS nt
       |  FROM m WINDOW w AS (PARTITION BY u ORDER BY us, id)),
       |tr AS (
       |  SELECT CASE WHEN pj IS NULL OR pj <> j THEN 'start' ELSE pt END
       |      AS src,
       |    CASE WHEN t = '$Conversion' THEN 'conv' ELSE t END AS dst
       |  FROM s
       |  UNION ALL
       |  SELECT t, 'null' FROM s WHERE nt IS NULL AND t <> '$Conversion'),
       |cnt AS MATERIALIZED (
       |  SELECT src, dst, count(*)::HUGEINT AS n FROM tr GROUP BY 1, 2),
       |tot AS MATERIALIZED (
       |  SELECT src, sum(n) AS tot FROM cnt GROUP BY 1),
       |st(state) AS MATERIALIZED (VALUES $stVals),
       |vr(rm) AS MATERIALIZED (VALUES $vrVals),
       |base AS MATERIALIZED (
       |  SELECT vr.rm, st.state FROM st CROSS JOIN vr),
       |v0 AS MATERIALIZED (
       |  SELECT rm, state, 0::HUGEINT AS v FROM base),
       |$steps,
       |p AS MATERIALIZED (
       |  SELECT rm, v FROM v$Iters WHERE state = 'start'),
       |eff AS MATERIALIZED (
       |  SELECT p.rm AS channel,
       |    (SELECT v FROM p p2 WHERE p2.rm = '') - p.v AS e
       |  FROM p WHERE p.rm <> ''),
       |te AS (SELECT sum(e) AS te FROM eff)
       |SELECT channel, CAST(e AS BIGINT) AS removal_effect_e9,
       |  CAST(CASE WHEN te.te = 0 THEN 0
       |    ELSE e * 1000000 // te.te END AS BIGINT) AS share_ppm
       |FROM eff CROSS JOIN te""".stripMargin
  }
}

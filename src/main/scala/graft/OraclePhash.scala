package graft

/** DuckDB-SQL replay of the pHash pipeline
  * ([[graft.multimodal.Phash]]) — pixels, integer DCT, median
  * threshold, banding-free brute-force pairing.
  *
  * The replay starts from the SYNTHESIS RULE (a pure integer
  * function of doc_id), while the Spark side goes through a real PNG
  * encode → `javax.imageio` decode before hashing: PNG is lossless,
  * so hash equality certifies the DECODE path (stride, channel,
  * sample extraction) exactly like the WAV-waveform replay certifies
  * the audio codec. The Q14 cosine table rides in the SQL as the
  * SAME 256 literals the Scala source embeds
  * ([[graft.multimodal.Phash.CosQ14]]) — no engine's `cos` or float
  * rounding is anywhere in the compare. All products stay inside
  * BIGINT (≤ ~7e13 coefficients; the stage sums pass through DuckDB
  * HUGEINT and cast back exact).
  *
  * The near-dup oracle pairs by brute force (verification scale is
  * 500–5000 images); the Spark side's banded join must emit the
  * identical exact radius-3 set — pigeonhole over 4×16-bit bands —
  * so agreement also certifies the banding.
  */
object OraclePhash {

  /** Shared CTE chain `… → h(asset_id, ph_hi, ph_lo)`. */
  private def hashCte: String =
    s"""WITH g AS (SELECT doc_id, doc_id // 2 AS gid, doc_id % 2 AS odd
           FROM documents),
         grid AS (SELECT doc_id, gid, odd, y.i AS y, x.i AS x,
             ((mm.m * mm.m % 1000000007) * mm.m % 1000000007) % 256
               AS g0
           FROM g, range(32) y(i), range(32) x(i),
             LATERAL (SELECT (gid*1000003 + (y.i*32 + x.i) + 1)
               % 1000000007 AS m) mm),
         pk AS (SELECT gid, (gid*31 + j.j*17) % 32 AS px,
                  (gid*57 + j.j*23) % 32 AS py, count(*) AS k
                FROM (SELECT DISTINCT gid FROM g) gids, range(4) j(j)
                GROUP BY 1, 2, 3),
         pix AS (SELECT doc_id, y, x,
             CASE WHEN odd = 1 THEN least(255, g0 + 8*coalesce(k, 0))
                  ELSE g0 END AS gv
           FROM grid LEFT JOIN pk
             ON pk.gid = grid.gid AND pk.px = grid.x AND pk.py = grid.y),
         ct AS (SELECT ii.i AS i, jj.j AS j,
                  CAST(tab[ii.i + 1][jj.j + 1] AS BIGINT) AS c
                FROM (SELECT ${graft.multimodal.Phash.CosTabSql} AS tab) t,
                  range(8) ii(i), range(32) jj(j)),
         s1 AS (SELECT doc_id, ct.i AS u, pix.x AS x,
                  sum(ct.c * pix.gv) AS s1
                FROM pix JOIN ct ON ct.j = pix.y GROUP BY 1, 2, 3),
         s2 AS (SELECT doc_id, s1.u AS u, ct.i AS v,
                  CAST(sum(ct.c * s1.s1) AS BIGINT) AS f
                FROM s1 JOIN ct ON ct.j = s1.x GROUP BY 1, 2, 3),
         med AS (SELECT doc_id, f AS med FROM
                 (SELECT doc_id, f, row_number() OVER
                    (PARTITION BY doc_id ORDER BY f) AS rn FROM s2)
                 WHERE rn = 32),
         bits AS (SELECT s2.doc_id, u*8 + v AS i,
                    CASE WHEN f > med THEN 1 ELSE 0 END AS bit
                  FROM s2 JOIN med ON s2.doc_id = med.doc_id),
         h AS (SELECT doc_id AS asset_id,
                 CAST(sum(CASE WHEN i >= 32
                   THEN bit * (CAST(1 AS BIGINT) << (i - 32))
                   ELSE 0 END) AS BIGINT) AS ph_hi,
                 CAST(sum(CASE WHEN i < 32
                   THEN bit * (CAST(1 AS BIGINT) << i)
                   ELSE 0 END) AS BIGINT) AS ph_lo
               FROM bits GROUP BY doc_id)"""

  val phashSql: String =
    s"""$hashCte
       SELECT asset_id, ph_hi, ph_lo FROM h"""

  val neardupSql: String =
    s"""$hashCte
       SELECT h1.asset_id AS id_1, h2.asset_id AS id_2,
         CAST(bit_count(xor(h1.ph_hi, h2.ph_hi)) +
              bit_count(xor(h1.ph_lo, h2.ph_lo)) AS INT) AS hamming
       FROM h h1 JOIN h h2 ON h1.asset_id < h2.asset_id
       WHERE bit_count(xor(h1.ph_hi, h2.ph_hi)) +
             bit_count(xor(h1.ph_lo, h2.ph_lo)) <= 3"""

  /** Connected components over the radius-3 pair graph by a
    * transitive-closure recursive CTE (the q_doc_neardup_clusters
    * oracle pattern) — each image labeled with the smallest id
    * reachable through near-dup pairs.
    */
  val clustersSql: String =
    s"""${hashCte.replaceFirst("WITH g AS", "WITH RECURSIVE g AS")},
       pp AS (SELECT h1.asset_id AS pa, h2.asset_id AS pb
              FROM h h1 JOIN h h2 ON h1.asset_id < h2.asset_id
              WHERE bit_count(xor(h1.ph_hi, h2.ph_hi)) +
                    bit_count(xor(h1.ph_lo, h2.ph_lo)) <= 3),
       edges AS (SELECT pa AS a, pb AS b FROM pp
                 UNION SELECT pb, pa FROM pp),
       reach AS (
         SELECT a, b FROM edges
         UNION SELECT a, a FROM edges
         UNION SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a)
       SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a"""
}

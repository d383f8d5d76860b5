package graft

/** DuckDB-SQL replay of the audio fingerprint pipeline
  * ([[graft.multimodal.AudioPrint]]) — waveform, planted
  * perturbation, windowed integer band energies, delta bits,
  * banding-free brute-force pairing.
  *
  * The replay starts from the SYNTHESIS RULE (a pure integer
  * function of doc_id and sample index), while the Spark side goes
  * through a real RIFF/WAVE encode → `javax.sound.sampled` decode
  * before fingerprinting: PCM is lossless, so fingerprint equality
  * certifies the DECODE path (container walk, byte order, sign
  * extension, sample count) exactly as the [[OraclePhash]] PNG
  * replay certifies the image decode. Everything is integer: the
  * waveform recurrence, the `+8192·hits` bump (clamped at 32767),
  * the window sums (≤ 485·65536 ≈ 3.2e7 — far inside BIGINT), and the
  * delta-sign bit packing.
  *
  * The near-dup oracle pairs by brute force (verification scale);
  * the Spark side's 4×16-bit pigeonhole band join must emit the
  * identical exact radius-3 set, so agreement also certifies the
  * banding.
  */
object OracleAudioPrint {

  /** CTE chain ending in `fp(asset_id, fp_hi, fp_lo)` — the full
    * fingerprint replay over the documents table.
    */
  private val fpChain: String =
    """WITH base AS (
         SELECT doc_id AS id, doc_id // 2 AS gid,
           8000 + (doc_id // 2) % 8000 AS n
         FROM documents),
       win AS (SELECT id, gid, n, n // 33 AS len FROM base),
       idx AS (SELECT id, gid, n, len,
                 unnest(generate_series(0, n - 1)) AS i
               FROM win),
       v0 AS (SELECT id, gid, n, len, i, i // len AS w,
                ((mm.m * mm.m % 1000000007) * mm.m % 1000000007)
                  % 65536 - 32768 AS v
              FROM idx, LATERAL (SELECT (gid*1000003 + i + 1)
                % 1000000007 AS m) mm),
       pk AS (SELECT gid, (gid*131 + j.j*8191) % n AS p, count(*) AS k
              FROM (SELECT DISTINCT gid, n FROM base) g, range(4) j(j)
              GROUP BY 1, 2),
       v1 AS (SELECT v0.id, v0.len, v0.w, v0.i,
                CASE WHEN v0.id % 2 = 1
                     THEN least(32767, v + 8192*coalesce(k, 0))
                     ELSE v END AS v
              FROM v0 LEFT JOIN pk
                ON pk.gid = v0.gid AND pk.p = v0.i),
       d AS (SELECT id, len, w, i, v,
               abs(v - lag(v) OVER (PARTITION BY id ORDER BY i)) AS dv
             FROM v1),
       e AS (SELECT id, w,
               CAST(sum(abs(v)) AS BIGINT) AS le,
               CAST(sum(CASE WHEN i % len != 0 THEN dv ELSE 0 END)
                 AS BIGINT) AS he
             FROM d WHERE w < 33 GROUP BY 1, 2),
       bits AS (SELECT id, w,
                  CASE WHEN le > lead(le) OVER
                    (PARTITION BY id ORDER BY w) THEN 1 ELSE 0 END AS lb,
                  CASE WHEN he > lead(he) OVER
                    (PARTITION BY id ORDER BY w) THEN 1 ELSE 0 END AS hb
                FROM e),
       fp AS MATERIALIZED (SELECT id AS asset_id,
                CAST(sum(hb * (CAST(1 AS BIGINT) << w)) AS BIGINT)
                  AS fp_hi,
                CAST(sum(lb * (CAST(1 AS BIGINT) << w)) AS BIGINT)
                  AS fp_lo
              FROM bits WHERE w < 32 GROUP BY 1)"""

  val fingerprintSql: String =
    s"""$fpChain
       SELECT asset_id, fp_hi, fp_lo FROM fp"""

  val neardupSql: String =
    s"""$fpChain
       SELECT f1.asset_id AS id_1, f2.asset_id AS id_2,
         CAST(bit_count(xor(f1.fp_hi, f2.fp_hi)) +
              bit_count(xor(f1.fp_lo, f2.fp_lo)) AS INT) AS hamming
       FROM fp f1 JOIN fp f2 ON f1.asset_id < f2.asset_id
       WHERE bit_count(xor(f1.fp_hi, f2.fp_hi)) +
             bit_count(xor(f1.fp_lo, f2.fp_lo)) <= 3"""

  /** Replay of the banded top-k search: candidacy = sharing at least
    * one 16-bit band (the pigeonhole space itself, NOT brute force —
    * the Spark side's multi-probe LSH candidate rule is part of the
    * certified semantics), ranked by (hamming, cand_id), cut at k=5.
    */
  val searchSql: String =
    s"""$fpChain,
       bands AS MATERIALIZED (SELECT asset_id, fp_hi, fp_lo, bb.b AS b,
                   CASE bb.b
                     WHEN 0 THEN fp_lo & 65535
                     WHEN 1 THEN (fp_lo >> 16) & 65535
                     WHEN 2 THEN fp_hi & 65535
                     ELSE (fp_hi >> 16) & 65535 END AS v
                 FROM fp, range(4) bb(b)),
       pairs AS (SELECT DISTINCT p.asset_id AS probe_id,
                   c.asset_id AS cand_id,
                   CAST(bit_count(xor(p.fp_hi, c.fp_hi)) +
                        bit_count(xor(p.fp_lo, c.fp_lo)) AS INT)
                     AS hamming
                 FROM bands p JOIN bands c
                   ON p.b = c.b AND p.v = c.v
                 WHERE p.asset_id % 50 = 0
                   AND p.asset_id != c.asset_id),
       ranked AS (SELECT probe_id, cand_id, hamming,
                    row_number() OVER (PARTITION BY probe_id
                      ORDER BY hamming, cand_id) AS rnk
                  FROM pairs)
       SELECT probe_id, CAST(rnk AS INT) AS rank, hamming, cand_id
       FROM ranked WHERE rnk <= 5"""

  /** Replay of the two-epoch streaming gate on the audio modality —
    * the [[OraclePhash.ingestGateSql]] CTE tail over the fingerprint
    * chain (epoch 0 = `asset_id % 3 = 0`, epoch 1 = the rest):
    * per-epoch connected components keep their min-id
    * representative, and an epoch-1 component is dropped entirely
    * when any member is within radius of ANY epoch-0 clip.
    */
  val ingestGateSql: String =
    s"""${fpChain.replaceFirst("WITH base AS", "WITH RECURSIVE base AS")},
       ep AS MATERIALIZED (SELECT asset_id, fp_hi, fp_lo,
                CASE WHEN asset_id % 3 = 0 THEN CAST(0 AS BIGINT)
                     ELSE CAST(1 AS BIGINT) END AS epoch
              FROM fp),
       pp AS (SELECT e1.asset_id AS pa, e2.asset_id AS pb
              FROM ep e1 JOIN ep e2
                ON e1.asset_id < e2.asset_id AND e1.epoch = e2.epoch
              WHERE bit_count(xor(e1.fp_hi, e2.fp_hi)) +
                    bit_count(xor(e1.fp_lo, e2.fp_lo)) <= 3),
       edges AS (SELECT pa AS a, pb AS b FROM pp
                 UNION SELECT pb, pa FROM pp),
       reach AS (
         SELECT a, b FROM edges
         UNION SELECT a, a FROM edges
         UNION SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a),
       cid AS (SELECT ep.asset_id, ep.epoch, ep.fp_hi, ep.fp_lo,
                 coalesce(mn.c, ep.asset_id) AS cid
               FROM ep LEFT JOIN
                 (SELECT a, min(b) AS c FROM reach GROUP BY a) mn
                 ON mn.a = ep.asset_id),
       seen AS (SELECT DISTINCT o.asset_id
                FROM ep o JOIN ep x ON o.epoch = 1 AND x.epoch = 0
                WHERE bit_count(xor(o.fp_hi, x.fp_hi)) +
                      bit_count(xor(o.fp_lo, x.fp_lo)) <= 3),
       bad AS (SELECT DISTINCT c.cid FROM cid c
               JOIN seen s ON s.asset_id = c.asset_id)
       SELECT c.asset_id, c.epoch, c.fp_hi, c.fp_lo
       FROM cid c
       WHERE c.asset_id = c.cid
         AND NOT EXISTS (SELECT 1 FROM bad WHERE bad.cid = c.cid)"""

  /** Connected components over the radius-3 pair graph — the
    * [[OraclePhash.clustersSql]] recursive-CTE pattern on the audio
    * modality.
    */
  val clustersSql: String =
    s"""${fpChain.replaceFirst("WITH base AS", "WITH RECURSIVE base AS")},
       pp AS (SELECT f1.asset_id AS pa, f2.asset_id AS pb
              FROM fp f1 JOIN fp f2 ON f1.asset_id < f2.asset_id
              WHERE bit_count(xor(f1.fp_hi, f2.fp_hi)) +
                    bit_count(xor(f1.fp_lo, f2.fp_lo)) <= 3),
       edges AS (SELECT pa AS a, pb AS b FROM pp
                 UNION SELECT pb, pa FROM pp),
       reach AS (
         SELECT a, b FROM edges
         UNION SELECT a, a FROM edges
         UNION SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a)
       SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a"""
}

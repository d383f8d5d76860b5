package graft

/** DuckDB-SQL replay of the pHash pipelines
  * ([[graft.multimodal.Phash]] and [[graft.multimodal.VideoPhash]])
  * — pixels, integer DCT, median threshold, banding-free brute-force
  * pairing.
  *
  * The replay starts from the SYNTHESIS RULE (a pure integer
  * function of doc_id — and, for video, frame index), while the
  * Spark side goes through a real PNG encode → `javax.imageio`
  * decode before hashing: PNG is lossless, so hash equality
  * certifies the DECODE path (stride, channel, sample extraction —
  * and for video, the whole RIFF/AVI chunk walk) exactly like the
  * WAV-waveform replay certifies the audio codec. The Q14 cosine
  * table rides in the SQL as the SAME 256 literals the Scala source
  * embeds ([[graft.multimodal.Phash.CosQ14]]) — no engine's `cos` or
  * float rounding is anywhere in the compare. All products stay
  * inside BIGINT (≤ ~7e13 coefficients; the stage sums pass through
  * DuckDB HUGEINT and cast back exact).
  *
  * The near-dup oracles pair by brute force (verification scale is
  * 500–5000 assets); the Spark side's banded join must emit the
  * identical exact radius-3 set — pigeonhole over 4×16-bit bands —
  * so agreement also certifies the banding.
  */
object OraclePhash {

  /** Shared CTE chain builder: given a source select yielding one
    * row per hashed raster as `(asset_id, fr, gid, odd)` — `gid` the
    * pixel-lattice group, `odd` whether the planted 4-pixel bump
    * applies — produce the chain ending in
    * `h(asset_id, fr, ph_hi, ph_lo)`. The image family instantiates
    * it with one frame per document; the video family with the
    * frame-expanded relation (same lattice, same bump rule — the
    * [[graft.multimodal.VideoPhash.frameImageId]] reuse contract).
    */
  private def hashChain(srcSql: String): String =
    s"""WITH src AS ($srcSql),
         grid AS (SELECT asset_id, fr, gid, odd, y.i AS y, x.i AS x,
             ((mm.m * mm.m % 1000000007) * mm.m % 1000000007) % 256
               AS g0
           FROM src, range(32) y(i), range(32) x(i),
             LATERAL (SELECT (gid*1000003 + (y.i*32 + x.i) + 1)
               % 1000000007 AS m) mm),
         pk AS (SELECT gid, (gid*31 + j.j*17) % 32 AS px,
                  (gid*57 + j.j*23) % 32 AS py, count(*) AS k
                FROM (SELECT DISTINCT gid FROM src) gids, range(4) j(j)
                GROUP BY 1, 2, 3),
         pix AS (SELECT asset_id, fr, y, x,
             CASE WHEN odd = 1 THEN least(255, g0 + 8*coalesce(k, 0))
                  ELSE g0 END AS gv
           FROM grid LEFT JOIN pk
             ON pk.gid = grid.gid AND pk.px = grid.x AND pk.py = grid.y),
         ct AS (SELECT ii.i AS i, jj.j AS j,
                  CAST(tab[ii.i + 1][jj.j + 1] AS BIGINT) AS c
                FROM (SELECT ${graft.multimodal.Phash.CosTabSql} AS tab) t,
                  range(8) ii(i), range(32) jj(j)),
         s1 AS (SELECT asset_id, fr, ct.i AS u, pix.x AS x,
                  sum(ct.c * pix.gv) AS s1
                FROM pix JOIN ct ON ct.j = pix.y GROUP BY 1, 2, 3, 4),
         s2 AS (SELECT asset_id, fr, s1.u AS u, ct.i AS v,
                  CAST(sum(ct.c * s1.s1) AS BIGINT) AS coef
                FROM s1 JOIN ct ON ct.j = s1.x GROUP BY 1, 2, 3, 4),
         med AS (SELECT asset_id, fr, coef AS med FROM
                 (SELECT asset_id, fr, coef, row_number() OVER
                    (PARTITION BY asset_id, fr ORDER BY coef) AS rn
                  FROM s2)
                 WHERE rn = 32),
         hbits AS (SELECT s2.asset_id, s2.fr, u*8 + v AS i,
                     CASE WHEN coef > med THEN 1 ELSE 0 END AS bit
                   FROM s2 JOIN med ON s2.asset_id = med.asset_id
                     AND s2.fr = med.fr),
         h AS MATERIALIZED (SELECT asset_id, fr,
                 CAST(sum(CASE WHEN i >= 32
                   THEN bit * (CAST(1 AS BIGINT) << (i - 32))
                   ELSE 0 END) AS BIGINT) AS ph_hi,
                 CAST(sum(CASE WHEN i < 32
                   THEN bit * (CAST(1 AS BIGINT) << i)
                   ELSE 0 END) AS BIGINT) AS ph_lo
               FROM hbits GROUP BY asset_id, fr)"""

  /** Image source: one raster per document; pairs (2k, 2k+1) share a
    * lattice group with the odd member carrying the planted bump.
    */
  private val imageSrc: String =
    "SELECT doc_id AS asset_id, 0 AS fr, doc_id // 2 AS gid, " +
      "doc_id % 2 AS odd FROM documents"

  /** Video source: one raster per (clip, frame); frame f of clip id
    * renders lattice group `(id // 2)·16 + f`, and the odd clip's
    * single perturbed frame (`(id // 2) % n_frames`) carries the
    * bump — [[graft.multimodal.VideoPhash.frameImageId]] verbatim.
    * DuckDB's `range` takes no lateral arguments, so the per-clip
    * frame count ({3,5,7}) is a cross join with range(7) filtered.
    */
  private val videoSrc: String =
    """SELECT doc_id AS asset_id, frx.f AS fr,
         (doc_id // 2) * 16 + frx.f AS gid,
         CASE WHEN doc_id % 2 = 1
               AND frx.f = (doc_id // 2) % (3 + 2 * ((doc_id // 2) % 3))
              THEN 1 ELSE 0 END AS odd
       FROM documents, range(7) frx(f)
       WHERE frx.f < 3 + 2 * ((doc_id // 2) % 3)"""

  private val imageChain: String = hashChain(imageSrc)

  val phashSql: String =
    s"""$imageChain
       SELECT asset_id, ph_hi, ph_lo FROM h"""

  val neardupSql: String =
    s"""$imageChain
       SELECT h1.asset_id AS id_1, h2.asset_id AS id_2,
         CAST(bit_count(xor(h1.ph_hi, h2.ph_hi)) +
              bit_count(xor(h1.ph_lo, h2.ph_lo)) AS INT) AS hamming
       FROM h h1 JOIN h h2 ON h1.asset_id < h2.asset_id
       WHERE bit_count(xor(h1.ph_hi, h2.ph_hi)) +
             bit_count(xor(h1.ph_lo, h2.ph_lo)) <= 3"""

  /** Replay of the [[graft.streaming.ImageIngest]] two-epoch gate
    * (epoch 0 = `asset_id % 3 = 0`, epoch 1 = the rest — the split
    * that lands some planted pairs intra-epoch, some cross-epoch in
    * either order): per-epoch connected components over WITHIN-epoch
    * radius-3 edges keep their min-id representative, and an epoch-1
    * component is dropped entirely when any member is within radius
    * of ANY epoch-0 image (every epoch-0 sighting — kept or dropped —
    * is recorded in the band index).
    */
  val ingestGateSql: String =
    s"""${imageChain.replaceFirst("WITH src AS", "WITH RECURSIVE src AS")},
       ep AS MATERIALIZED (SELECT asset_id, ph_hi, ph_lo,
                CASE WHEN asset_id % 3 = 0 THEN CAST(0 AS BIGINT)
                     ELSE CAST(1 AS BIGINT) END AS epoch
              FROM h),
       pp AS (SELECT e1.asset_id AS pa, e2.asset_id AS pb
              FROM ep e1 JOIN ep e2
                ON e1.asset_id < e2.asset_id AND e1.epoch = e2.epoch
              WHERE bit_count(xor(e1.ph_hi, e2.ph_hi)) +
                    bit_count(xor(e1.ph_lo, e2.ph_lo)) <= 3),
       edges AS (SELECT pa AS a, pb AS b FROM pp
                 UNION SELECT pb, pa FROM pp),
       reach AS (
         SELECT a, b FROM edges
         UNION SELECT a, a FROM edges
         UNION SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a),
       cid AS (SELECT ep.asset_id, ep.epoch, ep.ph_hi, ep.ph_lo,
                 coalesce(mn.c, ep.asset_id) AS cid
               FROM ep LEFT JOIN
                 (SELECT a, min(b) AS c FROM reach GROUP BY a) mn
                 ON mn.a = ep.asset_id),
       seen AS (SELECT DISTINCT o.asset_id
                FROM ep o JOIN ep x ON o.epoch = 1 AND x.epoch = 0
                WHERE bit_count(xor(o.ph_hi, x.ph_hi)) +
                      bit_count(xor(o.ph_lo, x.ph_lo)) <= 3),
       bad AS (SELECT DISTINCT c.cid FROM cid c
               JOIN seen s ON s.asset_id = c.asset_id)
       SELECT c.asset_id, c.epoch, c.ph_hi, c.ph_lo
       FROM cid c
       WHERE c.asset_id = c.cid
         AND NOT EXISTS (SELECT 1 FROM bad WHERE bad.cid = c.cid)"""

  /** Connected components over the radius-3 pair graph by a
    * transitive-closure recursive CTE (the q_doc_neardup_clusters
    * oracle pattern) — each image labeled with the smallest id
    * reachable through near-dup pairs.
    */
  val clustersSql: String =
    s"""${imageChain.replaceFirst("WITH src AS", "WITH RECURSIVE src AS")},
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

  // ----------------------------------------------------------------
  // Video: per-frame hashes → majority signature → banded near-dup
  // ----------------------------------------------------------------

  private val videoChain: String = hashChain(videoSrc)

  val videoPhashSql: String =
    s"""$videoChain
       SELECT asset_id, CAST(fr AS INT) AS frame_idx, ph_hi, ph_lo
       FROM h"""

  /** Majority-consensus clip signature: bit i set iff a strict
    * majority of the clip's frame hashes set bit i ({3,5,7} frames —
    * odd, so no ties).
    */
  private val signatureTail: String =
    """,
       nfr AS (SELECT asset_id, count(*) AS n_frames FROM h GROUP BY 1),
       pos AS (SELECT h.asset_id, p.i AS i,
                 CAST(sum(CASE WHEN p.i < 32 THEN (ph_lo >> p.i) & 1
                          ELSE (ph_hi >> (p.i - 32)) & 1 END)
                   AS BIGINT) AS cnt
               FROM h, range(64) p(i) GROUP BY 1, 2),
       maj AS (SELECT pos.asset_id, pos.i,
                 CASE WHEN 2*pos.cnt > nfr.n_frames THEN 1 ELSE 0 END
                   AS bit
               FROM pos JOIN nfr ON nfr.asset_id = pos.asset_id),
       sig AS MATERIALIZED (SELECT asset_id,
                 CAST(sum(CASE WHEN i >= 32
                   THEN bit * (CAST(1 AS BIGINT) << (i - 32))
                   ELSE 0 END) AS BIGINT) AS sig_hi,
                 CAST(sum(CASE WHEN i < 32
                   THEN bit * (CAST(1 AS BIGINT) << i)
                   ELSE 0 END) AS BIGINT) AS sig_lo
               FROM maj GROUP BY 1)"""

  val videoSignatureSql: String =
    s"""$videoChain$signatureTail
       SELECT sig.asset_id, CAST(nfr.n_frames AS BIGINT) AS n_frames,
         sig.sig_hi, sig.sig_lo
       FROM sig JOIN nfr ON nfr.asset_id = sig.asset_id"""

  val videoNeardupSql: String =
    s"""$videoChain$signatureTail
       SELECT va.asset_id AS id_1, vb.asset_id AS id_2,
         CAST(bit_count(xor(va.sig_hi, vb.sig_hi)) +
              bit_count(xor(va.sig_lo, vb.sig_lo)) AS INT) AS hamming
       FROM sig va JOIN sig vb ON va.asset_id < vb.asset_id
       WHERE bit_count(xor(va.sig_hi, vb.sig_hi)) +
             bit_count(xor(va.sig_lo, vb.sig_lo)) <= 3"""

  /** Replay of the banded top-k image search
    * ([[graft.multimodal.Phash.bandedSearch]]): candidacy = sharing
    * at least one 16-bit band (the pigeonhole space itself — the
    * multi-probe LSH candidate rule is part of the certified
    * semantics), ranked by (hamming, cand_id), cut at k=5; probes
    * are every 50th image.
    */
  val imageSearchSql: String =
    s"""$imageChain,
       bands AS MATERIALIZED (SELECT asset_id, ph_hi, ph_lo, bb.b AS b,
                   CASE bb.b
                     WHEN 0 THEN ph_lo & 65535
                     WHEN 1 THEN (ph_lo >> 16) & 65535
                     WHEN 2 THEN ph_hi & 65535
                     ELSE (ph_hi >> 16) & 65535 END AS v
                 FROM h, range(4) bb(b)),
       pairs AS (SELECT DISTINCT p.asset_id AS probe_id,
                   c.asset_id AS cand_id,
                   CAST(bit_count(xor(p.ph_hi, c.ph_hi)) +
                        bit_count(xor(p.ph_lo, c.ph_lo)) AS INT)
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

  /** Replay of the banded top-k VIDEO search — [[imageSearchSql]]'s
    * candidate/rank rule over clip signatures.
    */
  val videoSearchSql: String =
    s"""$videoChain$signatureTail,
       bands AS MATERIALIZED (SELECT asset_id, sig_hi, sig_lo, bb.b AS b,
                   CASE bb.b
                     WHEN 0 THEN sig_lo & 65535
                     WHEN 1 THEN (sig_lo >> 16) & 65535
                     WHEN 2 THEN sig_hi & 65535
                     ELSE (sig_hi >> 16) & 65535 END AS v
                 FROM sig, range(4) bb(b)),
       pairs AS (SELECT DISTINCT p.asset_id AS probe_id,
                   c.asset_id AS cand_id,
                   CAST(bit_count(xor(p.sig_hi, c.sig_hi)) +
                        bit_count(xor(p.sig_lo, c.sig_lo)) AS INT)
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

  /** Replay of the two-epoch streaming gate on the VIDEO modality —
    * the [[ingestGateSql]] CTE tail over clip signatures (epoch 0 =
    * `asset_id % 3 = 0`, epoch 1 = the rest): per-epoch connected
    * components keep their min-id representative, and an epoch-1
    * component is dropped entirely when any member is within radius
    * of ANY epoch-0 clip.
    */
  val videoIngestGateSql: String =
    s"""${(videoChain + signatureTail)
        .replaceFirst("WITH src AS", "WITH RECURSIVE src AS")},
       ep AS MATERIALIZED (SELECT asset_id, sig_hi, sig_lo,
                CASE WHEN asset_id % 3 = 0 THEN CAST(0 AS BIGINT)
                     ELSE CAST(1 AS BIGINT) END AS epoch
              FROM sig),
       pp AS (SELECT e1.asset_id AS pa, e2.asset_id AS pb
              FROM ep e1 JOIN ep e2
                ON e1.asset_id < e2.asset_id AND e1.epoch = e2.epoch
              WHERE bit_count(xor(e1.sig_hi, e2.sig_hi)) +
                    bit_count(xor(e1.sig_lo, e2.sig_lo)) <= 3),
       edges AS (SELECT pa AS a, pb AS b FROM pp
                 UNION SELECT pb, pa FROM pp),
       reach AS (
         SELECT a, b FROM edges
         UNION SELECT a, a FROM edges
         UNION SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a),
       cid AS (SELECT ep.asset_id, ep.epoch, ep.sig_hi, ep.sig_lo,
                 coalesce(mn.c, ep.asset_id) AS cid
               FROM ep LEFT JOIN
                 (SELECT a, min(b) AS c FROM reach GROUP BY a) mn
                 ON mn.a = ep.asset_id),
       seen AS (SELECT DISTINCT o.asset_id
                FROM ep o JOIN ep x ON o.epoch = 1 AND x.epoch = 0
                WHERE bit_count(xor(o.sig_hi, x.sig_hi)) +
                      bit_count(xor(o.sig_lo, x.sig_lo)) <= 3),
       bad AS (SELECT DISTINCT c.cid FROM cid c
               JOIN seen s ON s.asset_id = c.asset_id)
       SELECT c.asset_id, c.epoch, c.sig_hi, c.sig_lo
       FROM cid c
       WHERE c.asset_id = c.cid
         AND NOT EXISTS (SELECT 1 FROM bad WHERE bad.cid = c.cid)"""

  /** Connected components over the video radius-3 signature pair
    * graph — [[clustersSql]]'s recursive-CTE pattern over clip
    * signatures, for the multimodal manifest's video-keep column.
    */
  val videoClustersSql: String =
    s"""${(videoChain + signatureTail)
        .replaceFirst("WITH src AS", "WITH RECURSIVE src AS")},
       pp AS (SELECT va.asset_id AS pa, vb.asset_id AS pb
              FROM sig va JOIN sig vb ON va.asset_id < vb.asset_id
              WHERE bit_count(xor(va.sig_hi, vb.sig_hi)) +
                    bit_count(xor(va.sig_lo, vb.sig_lo)) <= 3),
       edges AS (SELECT pa AS a, pb AS b FROM pp
                 UNION SELECT pb, pa FROM pp),
       reach AS (
         SELECT a, b FROM edges
         UNION SELECT a, a FROM edges
         UNION SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a)
       SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a"""
}

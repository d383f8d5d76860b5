package graft

/** DuckDB-SQL replay of the multimodal pretrain MANIFEST
  * (q_multimodal_manifest) — the composition query that runs every
  * modality's dedup and emits one keep/drop row per document:
  *
  *  - text_keep:  the document is the first-seen member of its exact
  *    content-hash group (the q_doc_exact_dedup rule);
  *  - image_keep / audio_keep / video_keep: the document's asset is
  *    its near-dup CLUSTER representative in that modality (min-id
  *    over the radius-3 connected component; an asset with no pair
  *    is its own representative).
  *
  * Each modality relation is the EXISTING certified oracle chain
  * embedded as a derived table ([[OraclePhash.clustersSql]],
  * [[OraclePhash.videoClustersSql]],
  * [[OracleAudioPrint.clustersSql]]) — the manifest adds no new hash
  * math, only the keep/drop composition, which is exactly what it
  * certifies on the Spark side too.
  *
  * ORACLE-BOX NOTE: this statement only became feasible once the
  * hash chains marked their terminal CTEs `AS MATERIALIZED`
  * (OraclePhash.hashChain `h`, OracleAudioPrint `fp`,
  * signatureTail `sig`, the gate tails' `ep`). DuckDB inlines CTEs
  * by default, so every multi-reference re-evaluated the ENTIRE
  * upstream chain — the first manifest run evaluated the three
  * chains ~6× concurrently, spilled 78 GB of temp, and filled the
  * disk; with materialization the same statement runs in ~8 s at
  * sf0.01. The exact twin of the Spark side's
  * localCheckpoint-before-self-join rule
  * ([[graft.multimodal.Phash.neardupPairs]]).
  */
object OracleManifest {

  private def dropSet(clustersSql: String): String =
    s"""SELECT doc_id, FALSE AS k FROM ($clustersSql) c
        WHERE doc_id != cluster_id"""

  val manifestSql: String =
    s"""SELECT d.doc_id,
         coalesce(t.k, TRUE) AS text_keep,
         coalesce(i.k, TRUE) AS image_keep,
         coalesce(a.k, TRUE) AS audio_keep,
         coalesce(v.k, TRUE) AS video_keep,
         CAST((CASE WHEN coalesce(t.k, TRUE) THEN 1 ELSE 0 END) +
              (CASE WHEN coalesce(i.k, TRUE) THEN 1 ELSE 0 END) +
              (CASE WHEN coalesce(a.k, TRUE) THEN 1 ELSE 0 END) +
              (CASE WHEN coalesce(v.k, TRUE) THEN 1 ELSE 0 END)
           AS INT) AS n_kept,
         coalesce(t.k, TRUE) AND coalesce(i.k, TRUE) AND
           coalesce(a.k, TRUE) AND coalesce(v.k, TRUE) AS keep_all
       FROM documents d
       LEFT JOIN (SELECT doc_id, FALSE AS k FROM (
             SELECT doc_id,
               min(doc_id) OVER (PARTITION BY md5(text)) AS kid
             FROM documents) dd
           WHERE doc_id != kid) t ON t.doc_id = d.doc_id
       LEFT JOIN (${dropSet(OraclePhash.clustersSql)}) i
         ON i.doc_id = d.doc_id
       LEFT JOIN (${dropSet(OracleAudioPrint.clustersSql)}) a
         ON a.doc_id = d.doc_id
       LEFT JOIN (${dropSet(OraclePhash.videoClustersSql)}) v
         ON v.doc_id = d.doc_id"""

  /** DuckDB-SQL replay of the STREAMING multimodal manifest
    * (q_multimodal_ingest) — the two-epoch composed ingest
    * ([[graft.streaming.MultimodalIngest.manifestBatch]] applied as
    * epoch 0 = `doc_id % 3 = 0`, epoch 1 = the rest):
    *
    *  - text_keep: within-epoch min-id representative of the md5
    *    fingerprint group, dropped when the fingerprint was recorded
    *    by the earlier epoch (the first-seen exact gate);
    *  - image/audio/video keep: membership in that modality's
    *    two-epoch gate SURVIVOR set — each the already-certified
    *    gate oracle ([[OraclePhash.ingestGateSql]],
    *    [[OracleAudioPrint.ingestGateSql]],
    *    [[OraclePhash.videoIngestGateSql]]) embedded as a derived
    *    table, each referenced exactly once (the CTE-materialization
    *    lesson needs no new care here).
    */
  val ingestManifestSql: String = {
    val textKept =
      s"""SELECT doc_id, TRUE AS k FROM (
            SELECT doc_id, md5(text) AS f,
              CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS e,
              min(doc_id) OVER (PARTITION BY md5(text),
                CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END) AS kid
            FROM documents) x
          WHERE doc_id = kid AND (e = 0 OR NOT EXISTS (
            SELECT 1 FROM documents d0
            WHERE d0.doc_id % 3 = 0 AND md5(d0.text) = x.f))"""
    s"""SELECT d.doc_id,
         CAST(CASE WHEN d.doc_id % 3 = 0 THEN 0 ELSE 1 END AS BIGINT)
           AS epoch,
         coalesce(t.k, FALSE) AS text_keep,
         i.asset_id IS NOT NULL AS image_keep,
         a.asset_id IS NOT NULL AS audio_keep,
         v.asset_id IS NOT NULL AS video_keep,
         CAST((CASE WHEN coalesce(t.k, FALSE) THEN 1 ELSE 0 END) +
              (CASE WHEN i.asset_id IS NOT NULL THEN 1 ELSE 0 END) +
              (CASE WHEN a.asset_id IS NOT NULL THEN 1 ELSE 0 END) +
              (CASE WHEN v.asset_id IS NOT NULL THEN 1 ELSE 0 END)
           AS INT) AS n_kept,
         coalesce(t.k, FALSE) AND i.asset_id IS NOT NULL AND
           a.asset_id IS NOT NULL AND v.asset_id IS NOT NULL
           AS keep_all
       FROM documents d
       LEFT JOIN ($textKept) t ON t.doc_id = d.doc_id
       LEFT JOIN (${OraclePhash.ingestGateSql}) i
         ON i.asset_id = d.doc_id
       LEFT JOIN (${OracleAudioPrint.ingestGateSql}) a
         ON a.asset_id = d.doc_id
       LEFT JOIN (${OraclePhash.videoIngestGateSql}) v
         ON v.asset_id = d.doc_id"""
  }
}

package graft

import org.apache.spark.sql.functions.col

/** q_multimodal_manifest — the cross-modality keep/drop composition.
  * The hash math of each modality is certified elsewhere
  * (PhashSpec / VideoPhashSpec / AudioPrintSpec + the DuckDB
  * oracles); this spec pins the COMPOSITION invariants the manifest
  * adds on top.
  */
class ManifestSpec extends SparkTestBase {

  private lazy val m =
    SparkEntry.queries("q_multimodal_manifest")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getInt(5), r.getBoolean(6)))

  test("one row per document; derived columns consistent") {
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(m.length == nDocs)
    assert(m.map(_._1).distinct.length == m.length)
    m.foreach { case (id, t, i, a, v, nk, all) =>
      val flags = Seq(t, i, a, v)
      assert(nk == flags.count(identity), s"n_kept wrong for $id")
      assert(all == flags.forall(identity), s"keep_all wrong for $id")
    }
  }

  test("text keep is the exact-dedup first-seen rule") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val firstSeen = docs.groupBy(_._2).map { case (_, g) =>
      g.map(_._1).min
    }.toSet
    m.foreach { case (id, t, _, _, _, _, _) =>
      assert(t == firstSeen.contains(id), s"text_keep wrong for $id")
    }
  }

  test("modality keeps are the cluster representatives: planted odd twins drop") {
    // every (2k, 2k+1) planted pair is near-dup in image, audio, AND
    // video, so whenever both members exist the odd one must drop in
    // all three modalities and the even one must survive them
    val ids = m.map(_._1).toSet
    m.foreach { case (id, _, i, a, v, _, _) =>
      val twin = if (id % 2 == 0) id + 1 else id - 1
      if (ids.contains(twin)) {
        val expectKeep = id % 2 == 0
        assert(i == expectKeep, s"image_keep wrong for planted $id")
        assert(a == expectKeep, s"audio_keep wrong for planted $id")
        assert(v == expectKeep, s"video_keep wrong for planted $id")
      }
    }
  }
}

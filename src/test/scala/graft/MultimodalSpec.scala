package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("feature extraction: byte length and md5 match expression path") {
    val docs = Seq((1L, "hello"), (2L, "wörld")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(
      spark, Multimodal.assetsFromDocuments(docs)).toDF()
    val got = feats.select("asset_id", "n_bytes", "content_hash")
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // expression-path oracle on the same session
    val exp = docs.select(col("doc_id"),
      length(col("text").cast("binary")).cast("long").as("n"),
      md5(col("text").cast("binary")).as("h"))
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == exp)
    // unicode: "wörld" is 6 utf-8 bytes, 5 chars
    assert(got(2L)._1 == 6L)
  }

  test("stub decode is deterministic") {
    val p = "payload".getBytes("UTF-8")
    assert(Multimodal.StubCodec.decodeImage(p) ==
      Multimodal.StubCodec.decodeImage(p.clone()))
  }
}

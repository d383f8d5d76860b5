package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The JSONL interchange path under adversarial content: the
  * q_jsonl_roundtrip claim is "lossless transport", so pin it on the
  * inputs that break naive line formats — embedded newlines (the JSON
  * writer must escape them or the line framing shatters), tabs,
  * quotes, backslashes, unicode (BMP + astral), empty and null text —
  * and pin the malformed-line contract an ingest job relies on.
  */
class JsonlSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("adversarial strings survive the JSONL round trip byte-for-byte") {
    val nasty = Seq(
      1L -> "line one\nline two\r\nline three",   // framing hazard
      2L -> "tab\there \"quoted\" back\\slash",
      3L -> "unicode café 𤭢 😀  control",
      4L -> "",                                    // empty, not null
      5L -> null)                                  // null field
    val dir = java.nio.file.Files
      .createTempDirectory("jsonl_nasty").toString
    nasty.toDF("doc_id", "text").write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t }.toMap
    assert(back == nasty.toMap,
      s"round trip lost content: $back vs ${nasty.toMap}")
  }

  test("malformed lines: PERMISSIVE nulls the row, DROPMALFORMED drops it") {
    val dir = java.nio.file.Files
      .createTempDirectory("jsonl_corrupt").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part-000.json"),
      """{"doc_id": 1, "text": "good"}
        |{not json at all
        |{"doc_id": 3, "text": "also good"}
        |""".stripMargin)
    // default PERMISSIVE: the corrupt line becomes an all-null row —
    // an ingest job that counts rows would silently over-count
    val permissive = spark.read.schema(schema).json(dir)
    assert(permissive.count() == 3)
    assert(permissive.filter(col("doc_id").isNull).count() == 1)
    // DROPMALFORMED: the contract corpus ingest should read with —
    // bad lines vanish and the good rows arrive intact
    val dropped = spark.read.schema(schema)
      .option("mode", "DROPMALFORMED").json(dir)
      .as[(Long, String)].collect().toSet
    assert(dropped == Set(1L -> "good", 3L -> "also good"))
  }
}

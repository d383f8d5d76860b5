package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed diff between two table snapshots — "what changed between
  * corpus v=17 (what the model trained on) and v=23 (today)?" The
  * audit companion to TableStore.readAt: time-travel gives you back
  * either snapshot; this gives you the delta between them.
  *
  * Output: one row per differing key, `(key, change)` with `change ∈
  * {'insert','delete','update'}` (relative to `before` → `after`).
  * Identical rows emit nothing, so the result is |changed keys|-sized
  * — the interesting quantity at any scale.
  *
  * Scale shape: each side is reduced MAP-SIDE to `(key, fingerprint)`
  * — an xxhash64 over the null-safely serialized non-key columns —
  * before the full-outer join, so only ~16 bytes/row cross the
  * shuffle no matter how wide the table is (a 100 TB document corpus
  * diffs by moving ~1.6 GB/10⁸ docs, not the text). One key-hash
  * shuffle total; both sides' scans prune to key + compared columns.
  *
  * The fingerprint is null-safe and unambiguous: each column is
  * rendered as a length-prefixed string (concat of `length:value`),
  * with NULL rendered as `-1:` — distinct from every real value
  * including the empty string, and immune to concat-boundary
  * collisions ("ab","c" vs "a","bc"). Hash collisions would mask an
  * update with probability ~2⁻⁶⁴ per changed key; for forensic-grade
  * diffs pass `exact = true` to compare the rendered tuple itself
  * (wider shuffle, zero collision risk).
  */
object SnapshotDiff {

  private def rendered(df: DataFrame, key: String) = {
    val attrs = df.columns.filterNot(_ == key).sorted.toSeq
    val parts = attrs.map { a =>
      val s = col(s"`$a`").cast("string")
      when(s.isNull, lit("-1:"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }
    concat(parts: _*)
  }

  def diff(
      before: DataFrame,
      after: DataFrame,
      key: String,
      exact: Boolean = false): DataFrame = {
    require(before.columns.sorted.sameElements(after.columns.sorted),
      "snapshots must share a schema (run schema migration first)")
    def sig(df: DataFrame) = {
      val r = rendered(df, key)
      df.select(col(s"`$key`").as(key),
        (if (exact) r else xxhash64(r).cast("string")).as("__fp"))
    }
    val b = sig(before).withColumnRenamed("__fp", "__fp_b")
    val a = sig(after).withColumnRenamed("__fp", "__fp_a")
    b.join(a, Seq(key), "full_outer")
      .withColumn("change",
        when(col("__fp_b").isNull, lit("insert"))
          .when(col("__fp_a").isNull, lit("delete"))
          .when(col("__fp_b") =!= col("__fp_a"), lit("update")))
      .filter(col("change").isNotNull)
      .select(col(s"`$key`"), col("change"))
  }
}

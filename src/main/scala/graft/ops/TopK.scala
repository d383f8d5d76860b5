package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group top-k WITHOUT a window sort — the 100 TB substitute for
  * `row_number().over(partitionBy(keys).orderBy(...)) <= k`.
  *
  * The window form shuffles EVERY row to its group's partition and
  * sorts the whole group just to keep k rows; a hot group (one search
  * query matching 10⁸ documents) serializes through a single task.
  * This form runs Spark's bounded-heap collect aggregate
  * (`CollectTopK`, the engine-internal aggregate behind the pandas
  * API's nlargest) through the normal two-phase aggregate: each map
  * task keeps at most k rows per group in its heap, the exchange
  * carries ≤ k-element states instead of raw rows, and merge is
  * heap-union. Work per group is O(n log k), network is O(groups · k).
  *
  * Ordering is the NATURAL struct ordering of `ord` — lexicographic
  * by field. Make it total (append a unique id as the last field) and
  * encode any descending field numerically (negate, or flip with
  * `largest = true` when ALL fields should rank descending); ranks are
  * then deterministic on any layout. The heap itself is unordered, so
  * the op `array_sort`s the k survivors before ranking — k log k per
  * group, driver-free.
  *
  * Output: keys ++ (rank ∈ 1..k) ++ the fields of `ord`, flattened.
  */
object TopK {

  /** Spark's bounded-heap top-k collect aggregate as a Column:
    * keeps the k largest (`largest = true`) or smallest elements by
    * the input's natural ordering.
    */
  def collectTopK(c: Column, k: Int, largest: Boolean): Column = {
    require(k > 0, s"top-k needs k > 0, got $k")
    // CollectTopK's `reverse` flips to a MIN-heap of the smallest k —
    // reverse=false keeps the largest (the nlargest path)
    org.apache.spark.sql.GraftSqlShims.collectTopK(
      org.apache.spark.sql.GraftSqlShims.expression(c),
      k, reverse = !largest)
  }

  /** Top `k` rows per `keys` group, ranked by the natural (ascending)
    * struct ordering of `ord` — or its reverse with `largest = true`.
    * `ord` must be a struct column; its fields become output columns
    * next to `rank`.
    */
  def topKPerGroup(
      df: DataFrame,
      keys: Seq[String],
      ord: Column,
      k: Int,
      largest: Boolean = false): DataFrame = {
    val keyCols = keys.map(n => col(s"`$n`"))
    val agged = df.groupBy(keyCols: _*)
      .agg(collectTopK(ord, k, largest).as("topk"))
    val sorted =
      if (largest) reverse(array_sort(col("topk"))) else array_sort(col("topk"))
    val exploded = agged
      .select(keyCols :+ posexplode(sorted).as(Seq("pos", "row")): _*)
    val rowFields = exploded.select(col("row.*")).columns
    exploded.select(
      keyCols ++ Seq((col("pos") + 1).cast("int").as("rank")) ++
        rowFields.map(f => col(s"row.`$f`").as(f)): _*)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence: which items appear together in the
  * same basket (order, session, cart), with pair support counts — the
  * counting core of association-rule mining (the a-priori candidate
  * pass) and of "customers also bought" co-purchase panels over the
  * reference's sales data.
  *
  * The pair expansion is a per-basket self-join, so raw candidate
  * volume is Σ width² over baskets — fine when baskets are narrow
  * (TPC-H caps orders at 7 lines) and a task-sized blowup the moment
  * one hot basket holds 10⁵ items (10¹⁰ pairs under ONE join key).
  * Two guards bound it, in order:
  *
  *  1. SUPPORT PRUNE (exact): an item present in fewer than
  *     `minSupport` distinct baskets cannot participate in any pair
  *     with support ≥ `minSupport` (pair support ≤ either item's
  *     basket count — the a-priori monotonicity argument), so those
  *     items drop BEFORE pairing with zero effect on the result.
  *  2. BASKET CAP (explicit bound): after the prune, any basket still
  *     wider than `maxBasketSize` keeps only its `maxBasketSize`
  *     most-frequent items (ties to smaller item id), via the
  *     bounded-heap [[TopK]] — O(width · log cap) per map task and
  *     ≤ cap-row states on the wire, never a window sort. This is the
  *     only approximating step: pairs confined to a hyper-basket's
  *     long tail are dropped, which is the standard trade — a basket
  *     with 10⁵ items is a bot or a data error, and its tail pairs
  *     are noise at minSupport anyway. Candidate volume is bounded by
  *     Σ min(width, cap)² ≤ |baskets| · cap².
  *
  * Both guards are computed from the deduplicated (basket, item)
  * frame: presence, not quantity, defines co-occurrence.
  *
  * Emits `(item_1, item_2, support)` with `item_1 < item_2` (each
  * unordered pair once) and `support >= minSupport`.
  */
object Basket {

  def coPurchasePairs(
      items: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long = 1L,
      maxBasketSize: Int = 1024): DataFrame = {
    require(minSupport >= 1L, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketSize >= 2,
      s"maxBasketSize must be >= 2 (a pair needs two items), got " +
        maxBasketSize)
    val li = items
      .select(col(basketCol).as("__basket"), col(itemCol).as("__item"))
      .distinct()
    // guard 1 — exact a-priori prune on item basket-frequency
    val pruned =
      if (minSupport <= 1L) li
      else {
        val freq = li.groupBy(col("__item"))
          .agg(count(lit(1)).as("__item_baskets"))
          .filter(col("__item_baskets") >= minSupport)
        li.join(freq.select("__item"), Seq("__item"), "left_semi")
      }
    // guard 2 — cap over-wide baskets at their maxBasketSize
    // most-frequent items (frequent items are the ones that can still
    // clear minSupport); ties to smaller id keep the cut deterministic
    // on any layout. Hot baskets are by definition RARE, so the split
    // keeps the common path free of the cap machinery: the hot-basket
    // list broadcasts, in-cap rows pass through an anti join untouched,
    // and only hot rows pay the frequency join + bounded-heap TopK.
    val hot = pruned.groupBy(col("__basket"))
      .agg(count(lit(1)).as("__w"))
      .filter(col("__w") > maxBasketSize)
      .select("__basket")
    val cold = pruned.join(broadcast(hot), Seq("__basket"), "left_anti")
    val hotRows = pruned.join(broadcast(hot), Seq("__basket"), "left_semi")
    val itemFreq = pruned.groupBy(col("__item"))
      .agg(count(lit(1)).as("__f"))
    val hotCapped = TopK.topKPerGroup(
        hotRows.join(itemFreq, Seq("__item"))
          .withColumn("__neg_item", -col("__item")),
        Seq("__basket"),
        struct(col("__f"), col("__neg_item"), col("__item")),
        maxBasketSize, largest = true)
      .select(col("__basket"), col("__item"))
    val capped = cold.unionByName(hotCapped)
    val a = capped.select(col("__basket"), col("__item").as("item_1"))
    val b = capped.select(col("__basket"), col("__item").as("item_2"))
    a.join(b, Seq("__basket")).filter(col("item_1") < col("item_2"))
      .groupBy(col("item_1"), col("item_2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }
}

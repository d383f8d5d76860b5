package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Throwaway measurement bisects for the r16 optimization round —
  * times sub-steps of hot operators in isolation (guide §1: find the
  * dominant term before changing anything). Not part of any query
  * surface.
  */
object ProfileScratch {
  def timed(label: String)(f: => Any): Unit = {
    val t0 = System.nanoTime()
    val r = f
    println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2fs  ($r)")
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession =
      GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.TopK

    val li0 = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("__basket"), col("l_partkey").as("__item"))
    timed("warm: lineitem noop")(
      li0.write.mode("overwrite").format("noop").save())

    for (iter <- 1 to 2) {
    println(s"--- iteration $iter ---")
    // --- bisect coPurchasePairs ---
    val li = li0.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("distinct (cache populate) count")(li.count())
    val freq = li.groupBy(col("__item")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2L)
      .select(col("__item").cast("string").as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("freq agg count")(freq.count())
    var bytes: Array[Byte] = null
    timed("exactBloomIndex")(
      { bytes = graft.dedup.Dedup.exactBloomIndex(freq, fpp = 0.01); bytes.length })
    freq.unpersist()
    val pruned = li.filter(coalesce(
      graft.functions.GraftFunctions.bloomMightContain(
        col("__item").cast("string"), bytes), lit(false)))
    timed("bloom-pruned count")(pruned.count())
    timed("bloom-pruned noop")(
      pruned.write.mode("overwrite").format("noop").save())
    val baskets = pruned.groupBy(col("__basket"))
      .agg(array_sort(
        TopK.collectTopK(col("__item"), 1024, largest = false))
        .as("items"))
    timed("baskets collectTopK noop")(
      baskets.write.mode("overwrite").format("noop").save())
    val pairs = baskets
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
             transform(slice(items, i + 2, size(items)),
               y -> struct(x AS item_1, y AS item_2))))""")).as("p"))
      .select(col("p.item_1").as("item_1"), col("p.item_2").as("item_2"))
      .groupBy(col("item_1"), col("item_2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2L)
    timed("pairs agg noop")(
      pairs.write.mode("overwrite").format("noop").save())
    // plain collect_list variant of the basket stage, for comparison
    val baskets2 = pruned.groupBy(col("__basket"))
      .agg(array_sort(slice(collect_list(col("__item")), 1, 1024))
        .as("items"))
    timed("baskets collect_list noop")(
      baskets2.write.mode("overwrite").format("noop").save())
    li.unpersist()
    }
    spark.stop()
  }
}

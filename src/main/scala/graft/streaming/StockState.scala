package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful stream-side stock tracking (reference A5,
  * `kafka_consumer.py:110–117`: read CSV → subtract → rewrite CSV on
  * every single sale event).
  *
  * Here the running level per product lives in Spark's checkpointed
  * state store, keyed by product_id — partition-parallel, crash-safe,
  * no read-modify-write race. Emits the new level after each update
  * (OutputMode.Update).
  */
object StockState {

  case class Sale(product_id: Int, quantity: Int)
  case class Stock(product_id: Int, stock_level: Int)

  /** Per-key state transition: subtract the batch's quantities from the
    * running level (initialized from `initial` on first sight of the
    * key). Negative stock is representable — matching the reference,
    * which only guards inserts, not edits (kafka_producer.py:122).
    */
  def updateStock(initial: Map[Int, Int])(
      productId: Int,
      sales: Iterator[Sale],
      state: GroupState[Int]): Stock = {
    val current = state.getOption
      .getOrElse(initial.getOrElse(productId, 0))
    val next = current - sales.map(_.quantity).sum
    state.update(next)
    Stock(productId, next)
  }

  /** Wire the stateful transition onto a streaming Dataset of sales. */
  def stockLevels(
      spark: SparkSession,
      sales: Dataset[Sale],
      initial: Map[Int, Int]): Dataset[Stock] = {
    import spark.implicits._
    sales
      .groupByKey(_.product_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateStock(initial))
  }
}

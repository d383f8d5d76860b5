package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ Expression converters, for
  * exposing custom Catalyst expressions as user-facing Columns.
  * Standard extension-library pattern (a one-object file placed in the
  * `org.apache.spark.sql` package); no Spark internals are modified.
  */
object GraftSqlShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `CollectTopK` (the bounded-heap top-k collect aggregate behind
    * the pandas API's nlargest/nsmallest) is package-private; expose
    * it for [[graft.ops.TopK]]. `reverse = true` REVERSES the natural
    * ordering, i.e. keeps the SMALLEST k (the nsmallest path);
    * reverse = false keeps the largest.
    */
  def collectTopK(e: Expression, k: Int, reverse: Boolean): Column =
    column(catalyst.expressions.aggregate.GraftCollectShims
      .collectTopK(e, k, reverse))

  /** True when the session's CacheManager pins no plans — the
    * persist-leak probe: an operator that `persist`s internally must
    * release every pinned frame before returning (unpersist after
    * materializing, or checkpoint-and-release), so after the
    * operator's action the cache must be back to empty. Specs assert
    * this; `getPersistentRDDs` can't distinguish CacheManager pins
    * (leaks) from localCheckpoint blocks (ContextCleaner-reclaimed).
    */
  def cacheIsEmpty(spark: SparkSession): Boolean = spark match {
    case s: classic.SparkSession => s.sharedState.cacheManager.isEmpty
    case other => sys.error(s"unexpected session type: ${other.getClass}")
  }
}

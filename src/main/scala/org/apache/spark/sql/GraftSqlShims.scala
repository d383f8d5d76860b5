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
}

package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** [[CollectTopK]] is package-private; bridge its constructor for
  * [[org.apache.spark.sql.GraftSqlShims]] (same one-object-in-package
  * pattern as GraftSqlShims itself — nothing internal is modified).
  */
object GraftCollectShims {
  def collectTopK(e: Expression, k: Int, reverse: Boolean): AggregateExpression =
    CollectTopK(e, k, reverse).toAggregateExpression()
}

package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim for the package-private [[CollectTopK]] aggregate —
  * same pattern as the graftbridge Column⇄Expression shim: Spark 4
  * narrowed the constructor's visibility, and the bounded-heap
  * per-group top-k it implements is exactly the aggregate shape a
  * distributed re-rank wants (see graft.plans.AggExpressions).
  */
object GraftTopKBridge {
  def make(e: Expression, num: Int, reverse: Boolean): Expression =
    CollectTopK(e, num, reverse).toAggregateExpression()
}

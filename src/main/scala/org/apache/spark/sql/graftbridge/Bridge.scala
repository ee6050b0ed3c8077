package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression accessors. Spark 4 made these `private[sql]`
  * (Connect split); custom Catalyst expressions still need them, so
  * this package-positioned shim re-exposes the two converters.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Catalyst's bounded-heap top-k aggregate (package-private, used
    * by the pandas API's nlargest): per-group k-extreme elements with
    * map-side partial aggregation — the aggregate-shaped alternative
    * to a full per-group window sort. `reverse = false` keeps the
    * LARGEST elements under the child struct's lexicographic
    * ordering. (Constructor access via the aggregate-package shim.)
    */
  def collectTopK(e: Expression, num: Int, reverse: Boolean): Expression =
    org.apache.spark.sql.catalyst.expressions.aggregate.GraftTopKBridge
      .make(e, num, reverse)
}

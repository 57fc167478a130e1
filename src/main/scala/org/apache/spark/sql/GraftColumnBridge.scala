package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's private[sql] Column<->Expression conversions, so
  * graft's native Catalyst expressions (e.g. GeohashExpr) can surface as
  * plain `Column`s in the public API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

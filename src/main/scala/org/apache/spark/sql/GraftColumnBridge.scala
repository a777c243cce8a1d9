package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge: `ExpressionUtils` is `private[sql]`, and
  * graft's native expressions ([[graft.cond.ParseValueExpr]]) need to wrap
  * into `Column`s. This is the only file outside the `graft` namespace.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge for Spark 4's `private[sql]` Column↔Expression converters —
  * the standard pattern for libraries that ship custom Catalyst expressions
  * (the public surface intentionally hides catalyst internals; a custom
  * `Expression` like graft's SimHash64 needs exactly this seam and nothing
  * else from the internal API).
  */
object GraftExpressionBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

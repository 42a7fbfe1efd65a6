package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` helpers so graft's custom Catalyst expressions
  * can be wrapped as user-facing `Column`s (Spark 4 moved the
  * Expression<->Column constructors behind the classic module).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

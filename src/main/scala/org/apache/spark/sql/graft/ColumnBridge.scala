package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the sql-internal Column↔Expression converters for the
  * engine's custom Catalyst expressions — the standard extension-project
  * pattern for expressions whose constructors carry non-Column
  * parameters (a function-registry builder cannot close over them
  * per-call-site).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

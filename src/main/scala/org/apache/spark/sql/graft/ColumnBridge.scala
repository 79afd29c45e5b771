package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 hides Column ↔ Expression conversion behind the `classic`
  * bridge (`private[sql]`); custom Catalyst expressions still need it, so
  * we expose the two converters from inside the sql package namespace —
  * the standard extension-library escape hatch. */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
}

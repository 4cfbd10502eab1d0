package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge.
  *
  * Spark 4 made `Column.expr` / `new Column(expr)` private[sql] (Column
  * now wraps a connect-compatible ColumnNode). A library that ships
  * native Catalyst expressions still needs the conversion, so we host it
  * inside the org.apache.spark.sql package namespace — the same approach
  * used by Catalyst-extension libraries in the wild.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge into Spark 4's `private[sql]` Column ↔ Expression conversion —
  * the classic-backend equivalents of Spark 3's `new Column(expr)` /
  * `col.expr`. Lives under `org.apache.spark.sql` so the package-private
  * helpers resolve; the rest of graft uses only this narrow surface.
  *
  * Conversion must be EAGER (ColumnNodeToExpressionConverter), not the lazy
  * ColumnNodeExpression wrapper ExpressionUtils.expression returns — function
  * -registry builders run during analysis, and a deferred node embedded in
  * their output never gets resolved (INTERNAL_ERROR at codegen).
  */
object ColumnBridge {
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}

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

  /** Assert a provably-non-null derived column non-nullable (KnownNotNull).
    *
    * Join planning infers `isnotnull(key)` filters from equi-join keys and
    * pushes them through projections/aggregates by SUBSTITUTING the key's
    * defining expression — for a key defined by a large expression (e.g. a
    * k-means assignment over centroid literals) the inferred filter lands on
    * the scan as a second full evaluation per row, and because the inference
    * fires asymmetrically across self-join sides it also breaks exchange
    * reuse between subtrees that would otherwise canonicalize identically
    * (measured r20: semDedup's corpus pipeline materialized 4×). Marking the
    * column non-nullable removes the inference at the root: no isnotnull is
    * generated for non-nullable keys. Only sound when the expression truly
    * cannot produce null — the caller asserts that.
    */
  def knownNotNull(c: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.KnownNotNull(expression(c)))
}

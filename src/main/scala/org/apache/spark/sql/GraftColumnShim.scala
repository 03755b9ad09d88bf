package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Column <-> Expression bridge for graft's native Catalyst expressions.
 *
 * Spark 4 made the classic `Column(expr)` constructor `private[sql]`
 * (Column is connect-agnostic, backed by ColumnNode); extension libraries
 * that ship their own Expressions reach the classic converter through a
 * same-package accessor like this one — the standard pattern for
 * Catalyst-level extensions outside the Spark source tree.
 */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

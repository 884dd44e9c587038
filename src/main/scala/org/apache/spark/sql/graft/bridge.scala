/** Column ⇄ Expression bridge.
  *
  * Spark 4 made `Column(expr)` / `Column.expr` `private[sql]`
  * (columns wrap `ColumnNode`s; the catalyst `Expression` view lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`). Libraries that ship
  * native Catalyst expressions use exactly this shim: one tiny object
  * inside the `org.apache.spark.sql` package that re-exposes the two
  * converters. No other internal API is touched — everything else in
  * graft.* stays on the public surface.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

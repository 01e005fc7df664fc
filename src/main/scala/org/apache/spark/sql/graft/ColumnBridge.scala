package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> Expression converters.
  *
  * Spark 4.x `Column` wraps a `ColumnNode`, not a catalyst `Expression`,
  * so custom catalyst expressions (e.g. [[expressions.EwmaWindow]]) need
  * `org.apache.spark.sql.classic.ExpressionUtils` to surface as user-facing
  * `Column`s. This object lives under `org.apache.spark.sql` purely to be
  * inside the `private[sql]` access scope (standard extension-library
  * pattern, cf. SNIPPETS.md [2][3]).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

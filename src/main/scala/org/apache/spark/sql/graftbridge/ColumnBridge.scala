package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column <-> Expression converters.
  *
  * Spark 4 moved the Column/Expression boundary behind
  * `org.apache.spark.sql.classic.ExpressionUtils` (private[sql]); this is
  * the one sanctioned-shape shim that lets library code expose native
  * Catalyst expressions as user-facing Columns. Keep it minimal: no other
  * Spark internals are touched from this package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

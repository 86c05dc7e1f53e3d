package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column <-> Expression converters and
  * the live session's function registry.
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

  /** Register a scalar function on an ALREADY-RUNNING session (the
    * `spark.sql.extensions` path only applies at session construction).
    */
  def registerFunction(spark: SparkSession, name: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression bridge.
  *
  * Spark 4's `Column` wraps a `ColumnNode`, and the converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`,
  * so a library defining native catalyst expressions needs this shim in
  * an `org.apache.spark.sql` subpackage — the standard technique used
  * by third-party catalyst extensions. Nothing else in the engine
  * reaches into Spark internals.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

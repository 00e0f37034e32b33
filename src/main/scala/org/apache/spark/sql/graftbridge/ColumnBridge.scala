package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column ↔ Expression
  * conversions (Spark 4 moved Column onto ColumnNode; the classic
  * converter lives behind a package-private API). This is the one place
  * the engine touches a non-public Spark surface, and it only forwards.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column ↔ Expression
  * conversions (Spark 4 moved Column onto ColumnNode; the classic
  * converter lives behind a package-private API). This is the one place
  * the engine touches a non-public Spark surface, and it only forwards.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER ColumnNode → catalyst conversion. `expression` returns a
    * lazy `ColumnNodeExpression` wrapper, which Dataset APIs unwrap at
    * plan construction — but a `FunctionRegistry` builder's output goes
    * straight into the analyzer, which treats the wrapper as an opaque
    * resolved leaf (it reports NullType → the function "returns" void).
    * SQL-function builders must convert through this instead. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a SQL function on an ALREADY-RUNNING session (the
    * `SparkSessionExtensions` hook only applies at session build). */
  def registerFunction(spark: SparkSession, ident: FunctionIdentifier,
                       info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}

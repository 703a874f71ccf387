package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters of
  * Spark 4's classic API — the supported pattern for libraries exposing
  * custom Catalyst expressions as `Column`s.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode → Expression conversion. `expression` defers the
    * conversion inside a `ColumnNodeExpression` placeholder, which only
    * the Dataset boundary unwraps — an expression returned from a
    * `FunctionRegistry` builder mid-analysis would never be converted
    * and fails codegen. This converts the whole tree immediately; the
    * resulting `UnresolvedFunction` leaves resolve in the analyzer's
    * remaining fixed-point iterations like any parsed SQL.
    */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}

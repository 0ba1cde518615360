package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for custom Catalyst expressions.
  * Spark 4 made these converters private[sql]; extension libraries reach
  * them via a package-nested shim (same technique as other Catalyst
  * extension libraries — no Spark internals are modified).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly CONVERT a Column's node tree to catalyst expressions
    * (UnresolvedFunction nodes and all), instead of the lazy
    * `ColumnNodeExpression` wrapper `expression` returns. Required when
    * the result is spliced into an analyzer-driven context (a
    * FunctionRegistry builder): the wrapper is Unevaluable and opaque to
    * the analyzer, while a converted tree's unresolved functions resolve
    * in the analyzer's next fixed-point pass.
    */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}

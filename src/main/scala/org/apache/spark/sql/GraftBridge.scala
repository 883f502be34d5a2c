package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the classic Column <-> catalyst Expression converters, which
  * are private[sql] in Spark 4 — the sanctioned pattern for libraries that
  * ship custom Catalyst expressions without SparkSessionExtensions
  * registration.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column -> Expression conversion. [[expression]] wraps the
    * column's node tree in a lazy `ColumnNodeExpression` that only the
    * Dataset API's analysis path unwraps; an expression returned from a
    * FunctionRegistry builder (SQL path) never goes through that unwrap
    * and reaches codegen unevaluable. This converts the node tree to
    * catalyst expressions up front (any `UnresolvedFunction` children
    * resolve in the analyzer's normal fixpoint), so builder-composed
    * Column chains work from SQL.
    */
  def expressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}

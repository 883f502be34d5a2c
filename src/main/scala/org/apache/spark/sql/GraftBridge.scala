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
}

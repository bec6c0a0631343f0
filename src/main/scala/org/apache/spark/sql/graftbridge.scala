package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` column/expression conversions (the same
  * technique used by Spark-ecosystem libraries to expose custom Catalyst
  * expressions through the public Column API). Only forwards to
  * `org.apache.spark.sql.classic.ExpressionUtils` — no behavior of its
  * own.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

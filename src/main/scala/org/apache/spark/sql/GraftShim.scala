package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public `Column(Expression)` constructor and
  * `Column.expr`; the supported converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils` but are `private[sql]`.
  * This object sits in the `org.apache.spark.sql` package purely to
  * re-expose those two converters to graft's custom Catalyst expressions.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

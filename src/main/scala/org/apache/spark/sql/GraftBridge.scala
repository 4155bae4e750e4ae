package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the sql package: Spark 4 made the
  * Expression <-> Column converters `private[sql]`
  * (classic.ExpressionUtils), so third-party Catalyst expressions need
  * one line inside the namespace to obtain a Column. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

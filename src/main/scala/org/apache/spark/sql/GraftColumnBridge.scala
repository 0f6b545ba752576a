package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge to the sql-private Column <-> catalyst Expression
  * conversions (Spark 4 made Column node-based; classic.ExpressionUtils
  * is private[sql]). Standard pattern for out-of-tree Catalyst
  * extensions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

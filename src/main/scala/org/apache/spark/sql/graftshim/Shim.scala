package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column`s and Catalyst `Expression`s for custom
  * expressions. Spark 4 made these converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so extension libraries
  * expose them through a shim in the sql package — the standard pattern for
  * Catalyst-level extensions.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

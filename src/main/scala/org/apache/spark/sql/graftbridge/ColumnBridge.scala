package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters, so the
  * library can expose native Catalyst expressions (e.g.
  * graft.functions.DotProduct) as plain Columns. Standard extension
  * pattern for Spark-native plugins: the file lives under the
  * org.apache.spark.sql namespace purely for access, and wraps nothing
  * but the two public-shaped converters.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

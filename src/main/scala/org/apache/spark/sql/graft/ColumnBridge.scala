package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Expression ↔ Column converters —
  * the standard extension-library technique (a child package of
  * org.apache.spark.sql sees private[sql]) that lets graft's native
  * Catalyst expressions be used as Columns DIRECTLY at operator call
  * sites, with no SparkSessionExtensions registration required. SQL
  * users still get the registered `graft_*` names via GraftExtensions;
  * this bridge is what keeps the DataFrame operators self-contained.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

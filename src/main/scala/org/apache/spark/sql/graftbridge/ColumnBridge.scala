package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the
  * Column↔Expression bridge lives in `private[sql]` ExpressionUtils.
  * This is the minimal, standard shim extensions use: a subpackage of
  * `org.apache.spark.sql` re-exporting exactly the two conversions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

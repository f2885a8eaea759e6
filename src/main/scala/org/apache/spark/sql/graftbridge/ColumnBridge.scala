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

/** Plan introspection the memo machinery needs: an eagerly
  * `localCheckpoint(true)`-ed Dataset's analyzed plan is a single
  * `LogicalRDD` wrapping exactly the RDD that was persisted — its id is
  * the one to pin against between-query unpersist sweeps. Reading it
  * directly replaces the racy "diff the context-global persistent-RDD
  * set and take the max" heuristic (ADVICE r3).
  */
object PlanBridge {
  def checkpointRddId(df: org.apache.spark.sql.DataFrame): Option[Int] =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }
}

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

  /** Strip the inherited origin statistics (and constraints) from an
    * eagerly-checkpointed Dataset's `LogicalRDD`.
    *
    * WHY THIS EXISTS: `Dataset.localCheckpoint` truncates lineage but
    * PRESERVES the origin plan's `Statistics` on the `LogicalRDD`
    * (Spark 4's `originStats`). Size-only estimation multiplies join
    * children's `sizeInBytes` as unbounded `BigInt`s, so in an
    * iterative operator whose round output self-joins the previous
    * round's checkpoint (pointer-jumping CC, score-table fixed points),
    * the PRESERVED estimate compounds multiplicatively: the digit count
    * of `sizeInBytes` grows ~4× per round, and after a few dozen rounds
    * the planner spends MINUTES inside `BigInteger.multiply` on numbers
    * with millions of digits — planning, not execution, becomes the
    * scale ceiling. Dropping the origin stats resets each round's
    * leaves to `defaultSizeInBytes` (exactly the pre-Spark-3.4
    * behavior), which is also the honest estimate: checkpointed RDD
    * sizes are unknown to Catalyst anyway.
    */
  def withoutOriginStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        // LogicalRDD is curried: (output, rdd, partitioning, ordering,
        // isStreaming, stream)(session, originStats, originConstraints)
        org.apache.spark.sql.classic.Dataset.ofRows(spark, r.copy()(spark, None, None))
      case _ => df
    }
}

package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.DotProduct

/** SQL surface for the engine's native expressions.
  *
  * Two registration paths:
  *  - `withExtensions(new GraftExtensions)` at session build time (or
  *    `spark.sql.extensions=graft.GraftExtensions` in config) — the
  *    plug-in route for spark-submit users;
  *  - [[GraftExtensions.register]] on an existing session (temp
  *    functions) — the embedded/test route.
  *
  * After either, `SELECT dot_product(a, b)` runs the codegen'd
  * [[graft.expressions.DotProduct]] in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotProductDescription)
  }
}

object GraftExtensions {
  private def dotProductBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "dot_product(a, b) takes exactly two array<double> arguments")
    DotProduct(exprs.head, exprs(1))
  }

  private[graft] val dotProductDescription = (
    new FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (exprs: Seq[Expression]) => dotProductBuilder(exprs))

  /** Register the engine's SQL functions on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", dotProductBuilder, "scala_udf")
}

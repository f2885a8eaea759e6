package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions.{BitAndCount, DotProduct, IntsToBitset, SortedIntersectCount, UnitVector}

/** SQL surface for the engine's native expressions.
  *
  * Two registration paths:
  *  - `withExtensions(new GraftExtensions)` at session build time (or
  *    `spark.sql.extensions=graft.GraftExtensions` in config) — the
  *    plug-in route for spark-submit users;
  *  - [[GraftExtensions.register]] on an existing session (temp
  *    functions) — the embedded/test route.
  *
  * After either, `SELECT dot_product(a, b)`, `bit_and_count(a, b)`,
  * `unit_vector(v)` and `ints_to_bitset(ids, nWords)` run the codegen'd
  * expressions in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {
  private def binary(name: String, mk: (Expression, Expression) => Expression)
      (exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$name takes exactly two arguments")
    mk(exprs.head, exprs(1))
  }

  private def intsToBitsetBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "ints_to_bitset(ids, nWords) takes exactly two arguments")
    val nWords = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"ints_to_bitset: nWords must be an integer literal, got $other")
    }
    IntsToBitset(exprs.head, nWords)
  }

  private def winnowBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      "winnow_select(hashes, k, w) takes exactly three arguments")
    def intLit(e: Expression, name: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"winnow_select: $name must be an integer literal, got $other")
    }
    graft.expressions.WinnowSelect(exprs.head,
      intLit(exprs(1), "k"), intLit(exprs(2), "w"))
  }

  private[graft] val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "winnow_select" -> (winnowBuilder _),
    "dot_product" -> binary("dot_product(a, b)", DotProduct.apply) _,
    "bit_and_count" -> binary("bit_and_count(a, b)", BitAndCount.apply) _,
    "sorted_intersect_count" ->
      binary("sorted_intersect_count(a, b)", SortedIntersectCount.apply) _,
    "unit_vector" -> ((exprs: Seq[Expression]) => {
      require(exprs.length == 1, "unit_vector(v) takes exactly one argument")
      UnitVector(exprs.head)
    }),
    "ints_to_bitset" -> (intsToBitsetBuilder _))

  /** Register the engine's SQL functions on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

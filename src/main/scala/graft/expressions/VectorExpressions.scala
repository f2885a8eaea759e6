package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) allocates an intermediate
  * array and runs a lambda interpreter step per element; this expression
  * generates a tight fused loop instead (and stays inside whole-stage
  * codegen), which is the difference between ~35 s and a few seconds on
  * the all-pairs similarity queries at sf0.1. Summation is sequential in
  * element order — bit-for-bit the same result as the HOF version and as
  * DuckDB's list arithmetic, so oracle hash parity is preserved.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |int n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  acc += $x.getDouble(i) * $y.getDouble(i);
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Popcount of the bitwise AND of two `array<long>` bitmaps — set
  * intersection size when sets are encoded as fixed-width bitsets.
  * Generated code is a fused AND+POPCNT loop; the Jaccard all-pairs
  * dense path does one of these per candidate pair instead of a
  * co-occurrence join row per shared element.
  */
case class BitAndCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0
    var i = 0
    while (i < n) { s += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |int n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int cnt = 0;
         |for (int i = 0; i < n; i++) {
         |  cnt += java.lang.Long.bitCount($x.getLong(i) & $y.getLong(i));
         |}
         |${ev.value} = cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API for the codegen'd dot product; inputs must already be
    * `array<double>` (cast upstream — casting inside would break codegen
    * type assumptions).
    */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Intersection size of two bitset-encoded sets (`array<long>`). */
  def bitAndCount(a: Column, b: Column): Column =
    ColumnBridge.column(BitAndCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

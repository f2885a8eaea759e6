package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint selection (Schleimer–Wilkerson–Aiken)
  * over a string column: polynomial k-gram hashes mod 1e9+7, window-min
  * selection, first-occurrence-ordered distinct output.
  *
  * Value-identical to the HOF formulation in
  * [[graft.functions.TextStats.winnowSelected]]'s documentation
  * (split("") + ascii per char, per-position `aggregate`, window
  * `array_min`, `array_distinct`) — property-checked against it — but
  * evaluated as one fused char loop: the HOF path interprets a lambda
  * tree per element (measured ~5 s for 500 docs in one task), this runs
  * the same arithmetic in generated Java. Character values are Unicode
  * CODE POINTS (not UTF-16 code units), matching the HOF spec's
  * `split("") + ascii()` view and DuckDB `unicode()` on all text,
  * including supplementary-plane characters (emoji, rare CJK) — and
  * matching Spark `length()`'s code-point count that sizes `n_kgrams`.
  */
case class WinnowSelect(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, s"winnow_select: k and w must be >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(WinnowSelect.select(s, k, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cls = WinnowSelect.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = $cls.select($x.toString(), $k, $w);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSelect {
  private final val P = 1000000007L

  /** The fused loop: k-gram hashes, sliding window minima, ordered
    * dedup. O(n·k + n·w) time, O(n) scratch; no per-element boxing.
    */
  def select(s: String, k: Int, w: Int): Array[Long] = {
    // decode to code points first: charAt would hash UTF-16 surrogate
    // halves, diverging from the code-point view of the HOF spec /
    // DuckDB unicode() on non-BMP text (ADVICE r3)
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n < k) return Array.emptyLongArray
    val m = n - k + 1
    val kg = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * 31L + cps(i + j).toLong) % P; j += 1 }
      kg(i) = h
      i += 1
    }
    val out = new java.util.LinkedHashSet[Long]()
    if (m < w) {
      var mn = kg(0); var t = 1
      while (t < m) { if (kg(t) < mn) mn = kg(t); t += 1 }
      out.add(mn)
    } else {
      // plain windowed min re-scan: w is tiny (default 4); a deque would
      // shave the constant, not the shape
      var j0 = 0
      while (j0 <= m - w) {
        var mn = kg(j0); var t = j0 + 1
        while (t < j0 + w) { if (kg(t) < mn) mn = kg(t); t += 1 }
        out.add(mn)
        j0 += 1
      }
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var r = 0
    while (it.hasNext) { res(r) = it.next(); r += 1 }
    res
  }

  /** Column API. */
  def apply(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(text), k, w))
}

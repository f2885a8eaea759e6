package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply an ordered list of BPE merges to one word and return its token
  * array. A word starts as its character symbols; each merge rule
  * (a, b) runs as ONE left-to-right pass with PORTABLE-REPLACE
  * semantics: the pass is defined to be exactly equivalent to a string
  * `replace` over the delimiter encoding `|s1|s2|...|sn|` with pattern
  * `|a|b|` → `|ab|` — which means a match consumes its trailing
  * delimiter, so the symbol immediately AFTER a merge is appended
  * verbatim (it cannot start the next match of the same pass; scanning
  * resumes at the symbol after it). Chosen deliberately: the DuckDB
  * oracle replays learning and application as a pure string-replace
  * unroll, and `replace` in every engine is non-overlapping
  * left-to-right with exactly this consumption rule. The shield only
  * changes outcomes on immediate symbol repeats (`aaaa` → [aa, a, a],
  * not [aa, aa]); ordinary text is unaffected.
  *
  * Contract: input words must not contain `|` (strip upstream) and are
  * split into UTF-16 units (ASCII-safe; the corpus convention).
  */
case class BpeEncode(child: Expression, merges: Array[Array[String]])
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("merges", merges, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.expressions.BpeEncode.encode($w, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  /** Shared by interpreted eval and generated code (the codegen body is
    * one static call — the per-rule scan loop would bloat generated
    * methods for no gain at dictionary-apply cardinalities).
    */
  def encode(word: UTF8String, merges: Array[Array[String]]): ArrayData = {
    val s = word.toString
    var syms = new Array[String](s.length)
    var c = 0
    while (c < s.length) { syms(c) = String.valueOf(s.charAt(c)); c += 1 }
    var r = 0
    while (r < merges.length) {
      val a = merges(r)(0)
      val b = merges(r)(1)
      val out = new java.util.ArrayList[String](syms.length)
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out.add(a + b)
          // portable-replace shield: the trailing delimiter was consumed,
          // so the next symbol is appended verbatim and cannot start a
          // match in this pass
          if (i + 2 < syms.length) out.add(syms(i + 2))
          i += 3
        } else { out.add(syms(i)); i += 1 }
      }
      syms = out.toArray(new Array[String](out.size()))
      r += 1
    }
    val res = new Array[AnyRef](syms.length)
    var j = 0
    while (j < syms.length) { res(j) = UTF8String.fromString(syms(j)); j += 1 }
    new GenericArrayData(res)
  }

  def column(word: Column, merges: Array[Array[String]]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(word), merges))
}

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
  /** ONE left-to-right portable-replace pass of rule (a, b) — the unit
    * both [[BpeEncode]] (k rules, rank order) and [[BpeMergeOnce]] (the
    * incremental learner's single-rule step) apply, so applying rule r
    * to a word already encoded under rules 1..r−1 is BY CONSTRUCTION
    * identical to re-encoding under rules 1..r.
    */
  private[expressions] def mergePass(syms: Array[String], a: String, b: String): Array[String] = {
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
    out.toArray(new Array[String](out.size()))
  }

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
      syms = mergePass(syms, merges(r)(0), merges(r)(1))
      r += 1
    }
    val res = new Array[AnyRef](syms.length)
    var j = 0
    while (j < syms.length) { res(j) = UTF8String.fromString(syms(j)); j += 1 }
    new GenericArrayData(res)
  }

  /** [[mergePass]] over Catalyst array data — the [[BpeMergeOnce]]
    * kernel, shared by interpreted eval and generated code.
    */
  def mergeOnce(arr: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = arr.numElements()
    val syms = new Array[String](n)
    var i = 0
    while (i < n) { syms(i) = arr.getUTF8String(i).toString; i += 1 }
    val out = mergePass(syms, a.toString, b.toString)
    val res = new Array[AnyRef](out.length)
    var j = 0
    while (j < out.length) { res(j) = UTF8String.fromString(out(j)); j += 1 }
    new GenericArrayData(res)
  }

  def column(word: Column, merges: Array[Array[String]]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(word), merges))
}

/** Apply ONE merge rule (a, b) to an already-encoded symbol array —
  * the incremental learner's per-round step ([[BpeEncode]]'s single-rule
  * pass lifted to a standalone expression so a round touches only the
  * affected words' CURRENT symbols, never re-encoding from characters).
  */
case class BpeMergeOnce(child: Expression, a: String, b: String)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType, containsNull = false))

  private lazy val ua = UTF8String.fromString(a)
  private lazy val ub = UTF8String.fromString(b)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.mergeOnce(input.asInstanceOf[ArrayData], ua, ub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ra = ctx.addReferenceObj("a", ua, "org.apache.spark.unsafe.types.UTF8String")
    val rb = ctx.addReferenceObj("b", ub, "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.expressions.BpeEncode.mergeOnce($s, $ra, $rb);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeMergeOnce {
  def column(syms: Column, a: String, b: String): Column =
    ColumnBridge.column(BpeMergeOnce(ColumnBridge.expression(syms), a, b))
}

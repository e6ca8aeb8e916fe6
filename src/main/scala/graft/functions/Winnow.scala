package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint (Schleimer et al., SIGMOD'03) of a normalized text,
  * as a native Catalyst expression returning the sorted distinct window
  * minima joined with commas.
  *
  * Replaces a four-level nested higher-order-function pipeline (transform /
  * aggregate / slice per gram) whose interpreted evaluation was the second
  * most expensive query of the bench. One compiled pass per row: codepoints →
  * polynomial k-gram hashes (base 257, closed form, mod `mod`) → minima of
  * each sliding window of `w` grams → sorted distinct minima.
  *
  * Semantics mirror the DuckDB oracle exactly:
  *  - `ord` = Unicode codepoint, indexing by character (1-based);
  *  - texts shorter than one k-gram fall back to Σ cp(i)·i mod `mod`
  *    (empty text → 0);
  *  - fewer grams than one window → empty fingerprint (empty string).
  */
case class Winnow(child: Expression, k: Int, w: Int, mod: Long)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "winnow_fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.catalogString}")
  }

  private val pows: Array[Long] = {
    val p = new Array[Long](k)
    p(k - 1) = 1L
    for (j <- (k - 2) to 0 by -1) p(j) = p(j + 1) * 257L
    p
  }

  def compute(input: UTF8String): UTF8String = {
    val t = input.toString
    // character codepoints (matches DuckDB ord(t[i]) / 1-based char indexing)
    val n = t.codePointCount(0, t.length)
    val cp = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < t.length) {
      val c = t.codePointAt(off)
      cp(ci) = c
      ci += 1
      off += Character.charCount(c)
    }
    if (n < k) {
      var s = 0L
      var i = 0
      while (i < n) { s += cp(i).toLong * (i + 1); i += 1 }
      return UTF8String.fromString((s % mod).toString)
    }
    val g = new Array[Long](n - k + 1)
    var i = 0
    while (i < g.length) {
      var h = 0L
      var j = 0
      while (j < k) { h += cp(i + j).toLong * pows(j); j += 1 }
      g(i) = h % mod
      i += 1
    }
    if (g.length < w) return UTF8String.fromString("")
    val minima = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i <= g.length - w) {
      var m = g(i)
      var j = 1
      while (j < w) { if (g(i + j) < m) m = g(i + j); j += 1 }
      minima.add(m)
      i += 1
    }
    val sb = new java.lang.StringBuilder()
    val it = minima.iterator()
    while (it.hasNext) {
      if (sb.length() > 0) sb.append(',')
      sb.append(it.next().longValue())
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // stays inside whole-stage codegen: the generated code calls this
    // expression instance's compiled kernel directly
    val ref = ctx.addReferenceObj("winnow", this, classOf[Winnow].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  def fp(text: Column, k: Int, w: Int, mod: Long): Column =
    ColumnBridge.column(Winnow(ColumnBridge.expression(text), k, w, mod))
}

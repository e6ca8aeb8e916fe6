package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All character k-shingles of a text (duplicates kept, document order), as
  * a native Catalyst expression — the char-n-gram sibling of
  * [[WordShingles]], used by the trigram language-ID profiles where
  * MULTIPLICITY matters (profile training counts every occurrence).
  *
  * Exactly mirrors the SQL pipeline the DuckDB oracle runs:
  * {{{
  *   CASE WHEN length(text) < k THEN array(text)
  *   ELSE transform(sequence(1, length(text) - k + 1),
  *          i -> substring(text, i, k)) END
  * }}}
  * `substring` semantics are by codepoint (`UTF8String.substringSQL`),
  * identical to Spark's builtin. The interpreted sequence+transform chain
  * allocated a boxed lambda frame per character; this compiled pass stays
  * inside whole-stage codegen.
  */
case class CharShingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "char_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.catalogString}")
  }

  def compute(input: UTF8String): ArrayData = {
    val n = input.numChars()
    if (n < k) return new GenericArrayData(Array[Any](input))
    val out = new Array[Any](n - k + 1)
    // Round 17: slice shingles from ONE byte image. The previous loop
    // called substringSQL per position, and UTF8String.substring walks
    // codepoints from byte 0 on every call — O(len) per shingle, O(len²)
    // per document. Shingle i covers codepoints [i, i+k); its UTF-8 bytes
    // are the contiguous slice between those codepoints' byte offsets
    // (offset index built in one scan; identity on ASCII). Each slice is
    // copied into its own array — same bytes, same memory behavior as the
    // substring it replaces.
    val bytes = input.getBytes
    if (bytes.length == n) {
      var i = 0
      while (i <= n - k) {
        out(i) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, i, i + k))
        i += 1
      }
    } else {
      val offsets = new Array[Int](n + 1)
      var ci = 0
      var b = 0
      while (ci < n) {
        offsets(ci) = b
        b += UTF8String.numBytesForFirstByte(bytes(b))
        ci += 1
      }
      offsets(n) = bytes.length
      var i = 0
      while (i <= n - k) {
        out(i) = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, offsets(i), offsets(i + k)))
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cshingles", this, classOf[CharShingles].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {
  def of(text: Column, k: Int): Column =
    ColumnBridge.column(CharShingles(ColumnBridge.expression(text), k))
}

package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All stride-1 window fingerprints of a string in ONE native pass:
  * `[(pos, h60(substring(s, pos, winLen))) | pos <- 1 .. len-winLen+1]`,
  * where h60 is the shared cross-engine fingerprint
  * `conv(substring(md5(x), 1, 15), 16, 10)` (= the first 60 bits of the md5
  * digest as an unsigned BIGINT).
  *
  * The SQL spelling of the same pipeline —
  * `transform(sequence(1, len-49), i -> struct(i, conv(substring(md5(
  * substring(t, i, 50)), 1, 15), 16, 10)))` — evaluates the lambda
  * INTERPRETED per element (closure dispatch, a UTF8String copy, an md5 hex
  * STRING, and a base-16 parse per window): measured ~73 µs/window —
  * 300× the cost of the digest itself — which made the exact-substring
  * dedup family the slowest batch queries in the suite. Here the loop body
  * is plain JVM code: one digest into a reused thread-local MessageDigest,
  * the 60-bit value read directly from the digest bytes (first 8 bytes
  * big-endian, logical-shift-right 4 = the first 15 hex nibbles — exactly
  * what `conv(substr(hex, 1, 15), 16, 10)` parses), no hex string, no
  * per-window allocation beyond the result row.
  *
  * Substring semantics are SQL's (`UTF8String.substringSQL`, 1-based,
  * codepoint-aware), so the result is bit-identical to the interpreted
  * pipeline on any input, not just ASCII.
  */
case class SubstrHashes(child: Expression, winLen: Int) extends UnaryExpression {

  require(winLen >= 1, s"winLen must be positive, got $winLen")

  override def dataType: DataType = SubstrHashes.OutType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "substr_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SubstrHashes.compute(input.asInstanceOf[UTF8String], winLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.SubstrHashes.compute($t, $winLen);")

  override protected def withNewChildInternal(newChild: Expression): SubstrHashes =
    copy(child = newChild)
}

object SubstrHashes {
  val OutType: ArrayType = ArrayType(
    new StructType().add("pos", IntegerType, nullable = false)
      .add("h", LongType, nullable = false),
    containsNull = false)

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** JVM entry point shared by interpreted eval and generated code.
    *
    * Round 17: windows are hashed straight out of ONE byte image of the
    * string. The previous spelling called `t.substringSQL(pos, winLen)` per
    * window, and `UTF8String.substring` walks codepoints from byte 0 on
    * every call — O(len) per window, O(len²) per document (measured: the
    * dominant stage of the exact-substring dedup family) — plus two byte
    * copies per window (the substring's buffer and `getBytes`). Window
    * `pos` covers codepoints [pos-1, pos-1+winLen); its UTF-8 bytes are the
    * contiguous slice between those codepoints' byte offsets, so one
    * O(len) offset scan (identity on ASCII) replaces every walk, and
    * `md.update(bytes, start, len)` hashes the slice with zero copies.
    * The digested bytes are EXACTLY the bytes `substringSQL(...).getBytes`
    * produced — same md5, bit-identical h60, oracle untouched. */
  def compute(t: UTF8String, winLen: Int): ArrayData = {
    val n = t.numChars()
    val count = n - winLen + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val md = digests.get()
    val out = new Array[Any](count)
    val bytes = t.getBytes
    if (bytes.length == n) {
      // ASCII fast path: codepoint index == byte index
      var pos = 1
      while (pos <= count) {
        md.reset()
        md.update(bytes, pos - 1, winLen)
        out(pos - 1) = new GenericInternalRow(
          Array[Any](pos, H60.ofDigest(md.digest()))): InternalRow
        pos += 1
      }
    } else {
      // general path: byte offset of each codepoint, one linear scan
      // (identical traversal to UTF8String.substring's, done once)
      val offsets = new Array[Int](n + 1)
      var i = 0
      var b = 0
      while (i < n) {
        offsets(i) = b
        b += UTF8String.numBytesForFirstByte(bytes(b))
        i += 1
      }
      offsets(n) = bytes.length
      var pos = 1
      while (pos <= count) {
        val start = offsets(pos - 1)
        md.reset()
        md.update(bytes, start, offsets(pos - 1 + winLen) - start)
        out(pos - 1) = new GenericInternalRow(
          Array[Any](pos, H60.ofDigest(md.digest()))): InternalRow
        pos += 1
      }
    }
    new GenericArrayData(out)
  }

  /** `substr_hashes(s, winLen)` as a Column. */
  def of(s: Column, winLen: Int): Column =
    ColumnBridge.column(SubstrHashes(ColumnBridge.expression(s), winLen))
}

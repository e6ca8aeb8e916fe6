package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary over a string key: the candidate set
  * of a group's frequent items, as a native aggregate with full
  * partial-aggregation support (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Each task folds its rows into one bounded map of at most `k` (key,
  * counter) pairs — when a new key arrives at a full map, every counter
  * decrements by one and zeros drop (the classic MG step). Merging sums
  * two summaries and, if over `k` keys, subtracts the (k+1)-th largest
  * counter from all and drops non-positives — the PODS 2012 rule, which
  * preserves the MG guarantee under ANY merge tree: after folding N total
  * rows, every key with true frequency > N/(k+1) is PRESENT in the
  * summary, and each counter underestimates its key's frequency by at
  * most N/(k+1).
  *
  * The summary itself is merge-order-DEPENDENT (which counters absorbed
  * which decrements varies), so it is never gated directly. The
  * guarantee, however, is order-independent: the candidate set is always
  * a superset of the true heavy set, which is exactly what the two-pass
  * heavy-hitter protocol needs ([[graft.operators.TextAnalysis.text_heavy_hitters]]:
  * sketch pass → ≤k candidates broadcast → exact recount pass → threshold
  * filter), making the END result exact and deterministic while the
  * shuffle carries one ≤k-entry map per (group × partition) instead of
  * the full key domain.
  *
  * Semantics: nulls are skipped; an empty group yields an empty array;
  * output is the candidate KEYS sorted lexicographically (counters are
  * deliberately not exposed — they are merge-order artifacts).
  */
case class HeavyKeep(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"heavy_keep requires k > 0, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_keep"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** The classic MG insert: count if tracked, admit if room, else a
    * global decrement (amortized O(1) per row: each decrement pass is
    * paid for by k prior insertions). */
  private def insert(buffer: java.util.HashMap[String, Long], key: String): Unit = {
    if (buffer.containsKey(key)) {
      buffer.put(key, buffer.get(key) + 1L); ()
    } else if (buffer.size() < k) {
      buffer.put(key, 1L); ()
    } else {
      val it = buffer.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  override def update(
      buffer: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(
      b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = if (b1.containsKey(e.getKey)) b1.get(e.getKey) else 0L
      b1.put(e.getKey, prev + e.getValue)
    }
    if (b1.size() > k) {
      // PODS 2012 merge: subtract the (k+1)-th largest counter, drop <= 0
      val counts = new Array[Long](b1.size())
      var i = 0
      val cit = b1.values().iterator()
      while (cit.hasNext) { counts(i) = cit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val pivot = counts(counts.length - k - 1) // (k+1)-th largest
      val eit = b1.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= pivot) eit.remove() else e.setValue(e.getValue - pivot)
      }
    }
    b1
  }

  override def eval(buffer: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[String](buffer.size())
    buffer.keySet().toArray(keys)
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString(_).asInstanceOf[AnyRef]))
  }

  override def serialize(buffer: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buffer.size())
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries.add((kb, e.getValue))
      bytes += 4 + kb.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.size())
    var i = 0
    while (i < entries.size()) {
      val (kb, c) = entries.get(i)
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val kb = new Array[Byte](len)
      bb.get(kb)
      out.put(new String(kb, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyKeep =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyKeep =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyKeep =
    copy(child = newChild)
}

object HeavyKeep {
  /** `heavy_keep(a, k)` as an aggregate Column for the DataFrame API. */
  def of(a: Column, k: Int): Column =
    ColumnBridge.column(
      HeavyKeep(ColumnBridge.expression(a), k).toAggregateExpression())
}

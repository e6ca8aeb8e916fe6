package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise sum of `array<bigint>` rows, as a native aggregate with full
  * partial-aggregation support: each task folds its rows into one mutable
  * `Array[Long]` buffer, and the shuffle carries ONE dim-length array per
  * (group × partition) — the map-side combine that makes per-group vector
  * sums (e.g. k-means centroid accumulation over a 100 TB corpus) a single
  * narrow pass instead of an N×dim posexplode shuffle.
  *
  * Long addition is exact and associative, so the result is bit-identical
  * regardless of partitioning or merge order — the property the trained-IVF
  * oracle depends on (a float mean would be order-dependent; an integer sum
  * is not, and cosine's scale invariance makes the unnormalized sum a valid
  * centroid).
  *
  * Semantics: null rows and null elements are skipped (a null element
  * contributes 0, matching SQL `sum`'s null handling); an empty group yields
  * null; ragged input lengths are a hard error (vectors must share a dim).
  */
case class VecSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum_long"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> input, got ${t.catalogString}")
  }

  // Array.empty is the "no rows seen yet" sentinel: the true dim is fixed by
  // the first non-null row (merge of two sentinels stays a sentinel)
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // Reject n == 0 outright: a zero-length row is indistinguishable from
    // the empty "no rows seen" sentinel buffer, so letting it through would
    // make ragged detection order-dependent (absorbed if it arrives first,
    // a ragged error if it arrives after a sized row).
    require(n > 0, s"$prettyName: zero-length array input row")
    if (buffer.isEmpty) {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { if (!arr.isNullAt(i)) out(i) = arr.getLong(i); i += 1 }
      out
    } else {
      require(buffer.length == n,
        s"$prettyName: ragged input — buffer dim ${buffer.length} vs row dim $n")
      var i = 0
      while (i < n) { if (!arr.isNullAt(i)) buffer(i) += arr.getLong(i); i += 1 }
      buffer
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      require(b1.length == b2.length,
        s"$prettyName: ragged merge — ${b1.length} vs ${b2.length}")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumLong =
    copy(child = newChild)
}

object VecSumLong {
  /** `vec_sum_long(a)` as an aggregate Column for the DataFrame API. */
  def of(a: Column): Column =
    ColumnBridge.column(VecSumLong(ColumnBridge.expression(a)).toAggregateExpression())
}

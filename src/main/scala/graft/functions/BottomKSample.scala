package graft.functions

import java.nio.ByteBuffer
import java.util.TreeSet

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bottom-k-by-hash uniform sample accumulator: the k lexicographically
  * smallest DISTINCT `(hash, value)` pairs of the group, evaluated to the
  * sampled values sorted ascending — the mergeable random-sample summary of
  * Agarwal et al. (PODS 2012, "Mergeable Summaries", §random sampling),
  * driven by a caller-supplied per-row hash instead of an RNG so the result
  * is a PURE ORDER STATISTIC of the input set: bit-identical under any
  * partitioning, merge tree, or arrival order — the property that lets a
  * streaming state-store build of the sketch pass the exact batch oracle
  * (the [[KMinDistinct]] discipline, carrying a value payload).
  *
  * With the hash taken over a unique row tag, the kept pairs are a uniform
  * without-replacement size-k sample of the group, so rank statistics read
  * off the sorted sample carry the classic sampling guarantee (rank error
  * O(√(ln(1/δ))/√k) with probability 1−δ) — probabilistic, not the GK/KLL
  * deterministic bound, but MERGE-TREE-INVARIANT, which deterministic
  * compaction sketches are not; invariance is what an oracle-checked
  * distributed build needs. Distinct-pair semantics mirror an oracle's
  * `DISTINCT (hash, value)` exactly (with a unique tag the distinction is
  * vacuous up to 60-bit hash collisions).
  *
  * Each task folds its rows into one bounded TreeSet (≤ k pairs), and the
  * shuffle carries ONE ≤k-pair buffer per (group × partition) — map-side
  * combined, a constant-size summary however large the group.
  *
  * Semantics: null hash or value skips the row; an empty group yields an
  * empty array; output is the sampled values sorted ascending (ranks are
  * selected positionally downstream).
  */
case class BottomKSample(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TreeSet[(Long, Long)]] with BinaryLike[Expression] {

  require(k > 0, s"bottomk_sample requires k > 0, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottomk_sample"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint hash, bigint value), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  private val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

  override def createAggregationBuffer(): TreeSet[(Long, Long)] =
    new TreeSet[(Long, Long)](ord)

  private def insert(buffer: TreeSet[(Long, Long)], p: (Long, Long)): Unit = {
    if (buffer.size() < k) { buffer.add(p); () }
    else if (ord.lt(p, buffer.last())) {
      if (buffer.add(p)) { buffer.remove(buffer.last()); () }
    }
  }

  override def update(
      buffer: TreeSet[(Long, Long)], input: InternalRow): TreeSet[(Long, Long)] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null) insert(buffer, (h.asInstanceOf[Long], v.asInstanceOf[Long]))
    buffer
  }

  override def merge(
      b1: TreeSet[(Long, Long)], b2: TreeSet[(Long, Long)]): TreeSet[(Long, Long)] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buffer: TreeSet[(Long, Long)]): Any = {
    val out = new Array[Long](buffer.size())
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next()._2; i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(buffer: TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new TreeSet[(Long, Long)](ord)
    var i = 0
    val n = bytes.length / 16
    while (i < n) { out.add((bb.getLong(), bb.getLong())); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKSample =
    copy(left = newLeft, right = newRight)
}

object BottomKSample {
  /** `bottomk_sample(hash, value, k)` as an aggregate Column. */
  def of(hash: Column, value: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKSample(ColumnBridge.expression(hash), ColumnBridge.expression(value), k)
        .toAggregateExpression())
}

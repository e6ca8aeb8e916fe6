package graft.functions

import java.nio.ByteBuffer
import java.util.TreeSet

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, ArrayType, LongType}

/** KMV (k-minimum-values) sketch accumulator: the k smallest DISTINCT
  * `bigint` values of the group, as a native aggregate with full
  * partial-aggregation support (Bar-Yossef et al., RANDOM 2002 — the
  * classic distinct-count sketch; see also Beyer et al., SIGMOD 2007 for
  * the unbiased estimator and set-operation algebra).
  *
  * Each task folds its rows into one bounded `TreeSet` (at most k longs),
  * and the shuffle carries ONE ≤k-long array per (group × partition) — a
  * distinct-count sketch over a 100 TB corpus costs a single narrow pass
  * with map-side combine, never a shuffle of raw values. Unlike HLL the
  * sketch supports set ALGEBRA downstream: union = k smallest of the
  * merged arrays (exact, closed), and intersection estimates fall out of
  * the inclusion fraction within the union sketch — which is why KMV is
  * the sketch of choice for cross-source overlap profiling.
  *
  * "k smallest distinct values of a multiset" is order-independent, so the
  * result is bit-identical regardless of partitioning or merge order — the
  * property the gate oracle depends on (and the reason the estimator is
  * driven off exact integer order statistics, not float randomness).
  *
  * Semantics: nulls are skipped; an empty group yields an empty array (a
  * well-defined empty sketch, not null); the output is sorted ascending.
  */
case class KMinDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TreeSet[java.lang.Long]] with UnaryLike[Expression] {

  require(k > 0, s"kmin_distinct requires k > 0, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmin_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): TreeSet[java.lang.Long] =
    new TreeSet[java.lang.Long]()

  private def insert(buffer: TreeSet[java.lang.Long], v: Long): Unit = {
    // bound the set BEFORE inserting: skip values that cannot make the cut
    if (buffer.size() < k) { buffer.add(v); () }
    else if (v < buffer.last()) {
      if (buffer.add(v)) { buffer.remove(buffer.last()); () }
    }
  }

  override def update(
      buffer: TreeSet[java.lang.Long], input: InternalRow): TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      b1: TreeSet[java.lang.Long], b2: TreeSet[java.lang.Long]): TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buffer: TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size())
    val it = buffer.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new TreeSet[java.lang.Long]()
    var i = 0
    val n = bytes.length / 8
    while (i < n) { out.add(bb.getLong()); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinDistinct =
    copy(child = newChild)
}

object KMinDistinct {
  /** `kmin_distinct(a, k)` as an aggregate Column for the DataFrame API. */
  def of(a: Column, k: Int): Column =
    ColumnBridge.column(
      KMinDistinct(ColumnBridge.expression(a), k).toAggregateExpression())
}

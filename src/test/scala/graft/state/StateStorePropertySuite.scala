package graft.state

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import StateStoreTestHelper._

/** Property tests: the store must behave exactly like a `Map[String, Int]`
  * under arbitrary operation sequences, including across commit boundaries
  * and provider restarts (durability), in both checkpointing modes. The
  * reference had no property tests (SURVEY §5). ScalaCheck generators with
  * fixed seeds (the scalatest-scalacheck bridge is not on the offline
  * resolver, so sampling is driven manually and deterministically).
  */
class StateStorePropertySuite extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  sealed trait Op
  case class Put(k: String, v: Int) extends Op
  case class Remove(k: String) extends Op
  case object CommitBatch extends Op

  private val keyGen = Gen.oneOf((1 to 12).map(i => s"k$i"))
  private val opGen: Gen[Op] = Gen.frequency(
    6 -> (for { k <- keyGen; v <- Gen.choose(0, 1000) } yield Put(k, v)),
    2 -> keyGen.map(Remove(_)),
    1 -> Gen.const(CommitBatch))

  private def runOps(ops: List[Op], changelog: Boolean): Unit = {
    val ckpt = newCheckpointDir()
    val conf = storeConf(Map(RocksDbConf.CHANGELOG -> changelog.toString))
    val provider = newProvider(ckpt, conf = conf)
    val model = scala.collection.mutable.Map.empty[String, Int]
    var version = 0L
    var store = provider.getStore(version, None)
    try {
      ops.foreach {
        case Put(k, v) =>
          store.put(keyRow(k), valueRow(v), org.apache.spark.sql.execution.streaming.state.StateStore.DEFAULT_COL_FAMILY_NAME)
          model(k) = v
        case Remove(k) =>
          remove(store, k)
          model.remove(k)
        case CommitBatch =>
          version = store.commit()
          assert(readAll(store) === model.toMap) // post-commit reads stay valid
          store = provider.getStore(version, None)
      }
      // point lookups and full scan agree with the model
      (1 to 12).foreach { i =>
        assert(get(store, s"k$i") === model.get(s"k$i"))
      }
      assert(readAll(store) === model.toMap)
      version = store.commit()
    } finally provider.close()

    // durability: a fresh provider recovers the final state from durable files
    assert(getData(ckpt, version, conf = conf) === model.toMap)
  }

  test("store == model Map under arbitrary op sequences (changelog mode)") {
    samples(Gen.listOfN(60, opGen), 15).foreach(ops => runOps(ops, changelog = true))
  }

  test("store == model Map under arbitrary op sequences (full-snapshot mode)") {
    samples(Gen.listOfN(40, opGen), 8).foreach(ops => runOps(ops, changelog = false))
  }

  // ------------------- multi-valued (ListState-backed) stores -------------------
  // The round-9 decodeAll defect (frames decoded without the schema-id
  // prefix) lived exactly in this op family; the model here would have
  // caught any framing slip: putList REPLACES, merge/mergeList APPEND,
  // element order is insertion order.

  sealed trait MOp
  case class PutListOp(k: String, vs: List[Int]) extends MOp
  case class MergeOp(k: String, v: Int) extends MOp
  case class MergeListOp(k: String, vs: List[Int]) extends MOp
  case class MRemoveOp(k: String) extends MOp
  case object MCommitBatch extends MOp

  private val mOpGen: Gen[MOp] = Gen.frequency(
    3 -> (for { k <- keyGen; n <- Gen.choose(1, 4); vs <- Gen.listOfN(n, Gen.choose(0, 1000)) } yield PutListOp(k, vs)),
    4 -> (for { k <- keyGen; v <- Gen.choose(0, 1000) } yield MergeOp(k, v)),
    2 -> (for { k <- keyGen; n <- Gen.choose(1, 3); vs <- Gen.listOfN(n, Gen.choose(0, 1000)) } yield MergeListOp(k, vs)),
    2 -> keyGen.map(MRemoveOp(_)),
    1 -> Gen.const(MCommitBatch))

  private def runMultiOps(ops: List[MOp]): Unit = {
    val cf = org.apache.spark.sql.execution.streaming.state.StateStore.DEFAULT_COL_FAMILY_NAME
    val ckpt = newCheckpointDir()
    val conf = storeConf()
    val provider = newProvider(ckpt, conf = conf, useMultipleValuesPerKey = true)
    val model = scala.collection.mutable.Map.empty[String, Vector[Int]]
    def readLists(store: org.apache.spark.sql.execution.streaming.state.ReadStateStore): Map[String, Vector[Int]] =
      (1 to 12).flatMap { i =>
        val k = s"k$i"
        val vs = store.valuesIterator(keyRow(k), cf).map(valueInt).toVector
        if (vs.nonEmpty) Some(k -> vs) else None
      }.toMap
    var version = 0L
    var store = provider.getStore(version, None)
    try {
      ops.foreach {
        case PutListOp(k, vs) =>
          store.putList(keyRow(k), vs.map(valueRow).toArray, cf)
          model(k) = vs.toVector
        case MergeOp(k, v) =>
          store.merge(keyRow(k), valueRow(v), cf)
          model(k) = model.getOrElse(k, Vector.empty) :+ v
        case MergeListOp(k, vs) =>
          store.mergeList(keyRow(k), vs.map(valueRow).toArray, cf)
          model(k) = model.getOrElse(k, Vector.empty) ++ vs
        case MRemoveOp(k) =>
          remove(store, k)
          model.remove(k)
        case MCommitBatch =>
          version = store.commit()
          assert(readLists(store) === model.toMap) // post-commit reads stay valid
          store = provider.getStore(version, None)
      }
      assert(readLists(store) === model.toMap)
      // the single-row iterator view surfaces each key's FIRST element
      val it = store.iterator(cf)
      try it.foreach { p =>
        assert(model(keyStr(p.key)).head === valueInt(p.value))
      } finally it.close()
      version = store.commit()
    } finally provider.close()

    // durability: a fresh provider recovers every list from durable files
    val p2 = newProvider(ckpt, conf = conf, useMultipleValuesPerKey = true)
    try {
      val s2 = p2.getStore(version, None)
      try assert(readLists(s2) === model.toMap)
      finally s2.abort()
    } finally p2.close()
  }

  test("multi-valued store == model Map[String, Vector[Int]] under arbitrary op sequences") {
    samples(Gen.listOfN(50, mOpGen), 10).foreach(runMultiOps)
  }

  test("range codec is order-preserving for arbitrary longs") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", LongType, nullable = false)))
    val codec = new RangeScanKeyCodec(schema, Seq(0))
    val proj = UnsafeProjection.create(Array[DataType](LongType))
    def enc(v: Long) = codec.encode(proj(InternalRow(v)).copy())
    def cmp(x: Array[Byte], y: Array[Byte]): Int = {
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    }
    val longGen = Gen.oneOf(
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.oneOf(0L, 1L, -1L, Long.MinValue, Long.MaxValue, 1000L, -1000L))
    samples(Gen.zip(longGen, longGen), 300).foreach { case (a, b) =>
      assert(Integer.signum(cmp(enc(a), enc(b))) === Integer.signum(java.lang.Long.compare(a, b)))
    }
  }
}

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

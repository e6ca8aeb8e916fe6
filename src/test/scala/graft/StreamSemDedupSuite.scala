package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Incremental ≡ batch pin for [[StreamingQueries.stream_semdedup]]: the
  * streaming query (LSH-bucketed per-bucket representative state in the
  * graft RocksDB provider, SemDeDup dominated-pair rule applied across
  * micro-batch boundaries, retraction emissions folded by `bool_and`) must
  * equal an INDEPENDENT driver-side recomputation of the batch definition
  * from the raw fixtures — bucket assignment re-derived from
  * [[graft.operators.Lsh]]'s weight rows in plain Scala, dominance decided
  * with the same index-ordered double arithmetic. The DuckDB gate already
  * proves Spark-vs-oracle on the composed SQL mirror; this test removes the
  * twin-bug blind spot AND pins that the multi-batch incremental run equals
  * the one-shot batch answer (the arrival-order-independence claim).
  */
class StreamSemDedupSuite extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-stream-semdedup")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config(graft.Tables.nanosConf._1, graft.Tables.nanosConf._2)
    .getOrCreate()

  override def beforeAll(): Unit = { spark; () }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  test("stream_semdedup equals a driver-side batch SemDeDup recompute") {
    import graft.operators.Lsh
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val nb = Lsh.numBits(vecs.length.toLong)
    val w = Lsh.weightsFor(nb)

    // bucket id: the LshBits definition — quantize floor(x·2^20) to long,
    // nb exact ±1-weighted integer sign tests
    def blk(v: Array[Float]): Long = {
      val q = v.map(x => math.floor(x.toDouble * Lsh.QuantScale).toLong)
      var b = 0L
      for (k <- 0 until nb) {
        var s = 0L
        for (i <- q.indices) s += w(k)(i) * q(i)
        if (s >= 0) b |= (1L << k)
      }
      b
    }

    // batch dominated-pair rule per bucket: dropped iff a lower-id
    // bucket-mate sits at cosine >= 0.4 (dot > 0, dot^2 >= 0.16·n2a·n2b)
    val dropped = vecs.groupBy { case (_, v) => blk(v) }.values.flatMap { ms =>
      val sorted = ms.sortBy(_._1)
      val n2 = sorted.map { case (_, v) => dot(v, v) }
      for {
        j <- sorted.indices
        i <- 0 until j
        d = dot(sorted(i)._2, sorted(j)._2)
        if d > 0 && d * d >= 0.16 * n2(i) * n2(j)
      } yield sorted(j)._1
    }.toSet

    val langs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = langs.groupBy(_._2).map { case (lang, ds) =>
      val nDrop = ds.count { case (id, _) => dropped(id) }
      lang -> ((ds.length.toLong, ds.length.toLong - nDrop, nDrop.toLong))
    }

    val got = StreamingQueries.stream_semdedup(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, e) => assert(got(k) === e, s"lang $k") }
    assert(expected.values.map(_._3).sum > 0,
      "fixture must exercise the drop path (at least one semantic duplicate)")
  }
}

package graft

import graft.functions.BottomKSample
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Merge-regime contract of [[BottomKSample]] (the HeavyKeepSuite
  * discipline): the pinned property is merge-tree INVARIANCE — for every
  * partitioning, the evaluated sample must be IDENTICAL (it is a pure order
  * statistic of the (hash, value) set), and equal to a driver-side plain
  * Scala recompute. Plus the statistical point of the sketch: rank
  * statistics read off the sample land within the sampling error of the
  * true quantile.
  */
class BottomKSampleSuite extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("bottomk-sample")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def beforeAll(): Unit = { spark; () }
  override def afterAll(): Unit = spark.stop()

  /** Deterministic 64-bit scramble (splitmix64 finalizer) standing in for
    * the gate's md5-derived row hash — the invariance property holds for
    * ANY fixed per-row hash. */
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & Long.MaxValue // nonneg, like the 60-bit gate hash
  }

  // skewed value distribution: v = i² mod 10007 over 5000 unique rows
  private val rows: Seq[(Long, Long)] =
    (0 until 5000).map(i => (mix(i.toLong), (i.toLong * i) % 10007L))

  private val k = 256

  private def driverSample(): Seq[Long] =
    rows.sorted.take(k).map(_._2).sorted

  test("evaluated sample is identical under every partitioning (pure order statistic)") {
    import spark.implicits._
    val expected = driverSample()
    for (parts <- Seq(1, 3, 7, 32)) {
      val df = spark.sparkContext.parallelize(rows, parts).toDF("hv", "v")
      val got = df.agg(BottomKSample.of(col("hv"), col("v"), k).as("s"))
        .collect()(0).getSeq[Long](0)
      assert(got === expected, s"parts=$parts")
    }
  }

  test("grouped aggregation matches per-group driver recompute") {
    import spark.implicits._
    val grouped = rows.zipWithIndex.map { case ((h, v), i) => (i % 3, h, v) }
    val expected = grouped.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sorted.take(k).map(_._2).sorted
    }
    val df = spark.sparkContext.parallelize(grouped, 7).toDF("g", "hv", "v")
    val got = df.groupBy(col("g"))
      .agg(BottomKSample.of(col("hv"), col("v"), k).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (g, e) => assert(got(g) === e, s"group $g") }
  }

  test("sample median sits within sampling error of the true median") {
    val sample = driverSample()
    val p50 = sample(((sample.length - 1) * 50) / 100)
    val sortedVals = rows.map(_._2).sorted
    val rank = sortedVals.count(_ <= p50).toDouble / sortedVals.length
    // k=256 -> rank se ~ 1/(2*sqrt(k)) ~ 3.1%; allow 4 sigma
    assert(math.abs(rank - 0.5) < 0.125,
      s"sampled median rank $rank strays from 0.5")
  }

  test("nulls are skipped; small groups return the whole multiset") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (2L, 5L), (null, 99L), (3L, null)).toDF("hv", "v")
    val got = df.agg(BottomKSample.of(col("hv"), col("v"), k).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(got === Seq(5L, 10L))
  }
}

package graft

import graft.functions.KMinDistinct
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class KMinDistinctSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("kmindistinct")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = spark.stop()

  private def model(vs: Seq[Long], k: Int): Seq[Long] =
    vs.distinct.sorted.take(k)

  test("k smallest distinct values match the model, duplicates collapsed") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(17)
    // heavy duplication: 800 rows over ~60 distinct values, k below that
    val rows = Seq.fill(800)((rnd.nextInt(4).toLong, rnd.nextInt(60).toLong * 7919L))
    val df = rows.toDF("g", "v")
    val fast = df.groupBy("g").agg(KMinDistinct.of(col("v"), 16).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val slow = rows.groupBy(_._1).map { case (g, vs) => g -> model(vs.map(_._2), 16) }
    assert(fast === slow)
  }

  test("groups with fewer than k distinct values keep everything, sorted") {
    val s = spark; import s.implicits._
    val rows = Seq((1L, 5L), (1L, 3L), (1L, 5L), (1L, 9L), (2L, 42L))
    val out = rows.toDF("g", "v")
      .groupBy("g").agg(KMinDistinct.of(col("v"), 64).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(out(1L) === Seq(3L, 5L, 9L))
    assert(out(2L) === Seq(42L))
  }

  test("nulls skipped; empty group yields empty sketch (not null)") {
    val s = spark; import s.implicits._
    val out = Seq((1L, Some(7L)), (1L, None), (2L, None))
      .toDF("g", "v")
      .groupBy("g").agg(KMinDistinct.of(col("v"), 8).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(out(1L) === Seq(7L))
    assert(out(2L) === Seq.empty)
  }

  test("result is invariant under repartitioning (order statistics, not order)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(29)
    val rows = Seq.fill(2000)((rnd.nextInt(3).toLong, rnd.nextLong() & 0xFFFFFFFFFFFL))
    def run(parts: Int): Map[Long, Seq[Long]] =
      rows.toDF("g", "v").repartition(parts, col("v"))
        .groupBy("g").agg(KMinDistinct.of(col("v"), 32).as("sk"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(run(1) === run(13))
    val slow = rows.groupBy(_._1).map { case (g, vs) => g -> model(vs.map(_._2), 32) }
    assert(run(13) === slow)
  }

  test("KMV estimate from the sketch lands within the 3-sigma envelope") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(31)
    val k = 64
    // n distinct uniform 60-bit hashes; est = (k-1)*2^60 / kth ~ n ± n/sqrt(k-2)
    val n = 5000
    val vs = Seq.fill(n)(rnd.nextLong() & ((1L << 60) - 1)).distinct
    val sk = vs.toDF("v").groupBy().agg(KMinDistinct.of(col("v"), k).as("sk"))
      .collect()(0).getSeq[Long](0)
    val est = math.floor(63.0 * (1L << 60).toDouble / sk(k - 1).toDouble)
    assert(math.abs(est - vs.size) < 3.0 * vs.size / math.sqrt(k - 2.0),
      s"est $est vs exact ${vs.size}")
  }
}

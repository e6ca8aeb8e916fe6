package graft

import graft.functions.VecSumLong
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class VecSumLongSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("vecsumlong")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = spark.stop()

  test("element-wise sum matches the posexplode ground truth") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(200)(i => (i % 7L, Array.fill(16)(rnd.nextLong() % 1000000L)))
    val df = rows.toDF("g", "v")
    val fast = df.groupBy("g").agg(VecSumLong.of(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val slow = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).reduce((a, b) => a.zip(b).map { case (x, y) => x + y }).toSeq
    }
    assert(fast === slow)
  }

  test("result is invariant under repartitioning (exact, associative)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(500)(i => (i % 5L, Array.fill(8)(rnd.nextLong() % (1L << 40))))
    def run(parts: Int): Map[Long, Seq[Long]] =
      rows.toDF("g", "v").repartition(parts, col("v"))
        .groupBy("g").agg(VecSumLong.of(col("v")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(run(1) === run(13))
  }

  test("null rows skipped; null elements contribute zero; empty group is null") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Some(Seq[Option[Long]](Some(1L), None, Some(3L)))),
      (1L, Some(Seq[Option[Long]](Some(10L), Some(20L), Some(30L)))),
      (2L, None: Option[Seq[Option[Long]]]))
      .toDF("g", "v")
      .select(col("g"), col("v").cast("array<bigint>").as("v"))
    val out = df.groupBy("g").agg(VecSumLong.of(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).map(_.asInstanceOf[scala.collection.Seq[Long]].toSeq) === Some(Seq(11L, 20L, 33L)))
    assert(out(2L) === None)
  }

  test("ragged input lengths are a hard error, not silent truncation") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Array(1L, 2L)), (1L, Array(1L, 2L, 3L))).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(VecSumLong.of(col("v"))).collect()
    }
    assert(e.getMessage != null)
  }
}

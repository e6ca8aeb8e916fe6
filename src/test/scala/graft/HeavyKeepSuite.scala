package graft

import graft.functions.HeavyKeep
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries contract of [[HeavyKeep]] in its COMPRESSION regime —
  * key domain ≫ k, so decrements and the PODS-2012 merge actually fire
  * (the gate corpus has 31 tokens < k and never leaves the exact regime).
  *
  * The pinned property is the guarantee, not the summary: for every
  * partitioning (merge tree), the candidate set must contain every key
  * with true frequency > N/(k+1); with the exact recount + threshold on
  * top, the end-to-end result must EQUAL the true heavy set.
  */
class HeavyKeepSuite extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("heavykeep")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def beforeAll(): Unit = { spark; () }
  override def afterAll(): Unit = spark.stop()

  /** Skewed fixture: key "h<i>" appears 200-40·i times (5 heavy keys),
    * plus 400 singleton keys — domain 405 ≫ k. Deterministic. */
  private def skewedRows: Seq[String] =
    (0 until 5).flatMap(i => Seq.fill(200 - 40 * i)(s"h$i")) ++
      (0 until 400).map(i => s"tail$i")

  private def trueHeavy(rows: Seq[String], k: Int): Map[String, Long] = {
    val n = rows.size.toLong
    rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }.toMap
  }

  test("candidates are a superset of the true heavy set under any partitioning") {
    import spark.implicits._
    val rows = skewedRows
    val k = 8
    for (parts <- Seq(1, 3, 7, 32)) {
      val df = spark.sparkContext.parallelize(rows, parts).toDF("tok")
      val cand = df.agg(HeavyKeep.of(col("tok"), k).as("cand"))
        .collect()(0).getSeq[String](0).toSet
      assert(cand.size <= k, s"summary bounded at k=$k (parts=$parts)")
      val heavy = trueHeavy(rows, k).keySet
      assert(heavy.subsetOf(cand),
        s"parts=$parts: missing heavies ${heavy -- cand}")
    }
  }

  test("two-pass protocol returns exactly the true heavy set (compression regime)") {
    import spark.implicits._
    val rows = skewedRows
    val k = 8
    val expected = trueHeavy(rows, k)
    for (parts <- Seq(3, 7)) {
      val df = spark.sparkContext.parallelize(rows, parts).toDF("tok")
      val sketch = df.agg(HeavyKeep.of(col("tok"), k).as("cand"),
        count(lit(1)).as("total"))
      val got = df.join(broadcast(sketch))
        .filter(array_contains(col("cand"), col("tok")))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("cnt"), min(col("total")).as("total"))
        .filter(expr(s"cnt * ${k + 1} > total"))
        .select(col("tok"), col("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected, s"parts=$parts")
    }
  }

  test("empty input and all-null input yield an empty candidate array") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("tok")
      .agg(HeavyKeep.of(col("tok"), 4).as("cand")).collect()(0).getSeq[String](0)
    assert(empty.isEmpty)
    val nulls = Seq[Option[String]](None, None).toDF("tok")
      .agg(HeavyKeep.of(col("tok"), 4).as("cand")).collect()(0).getSeq[String](0)
    assert(nulls.isEmpty)
  }

  test("exact regime: domain <= k degrades to the full distinct key set") {
    import spark.implicits._
    val rows = Seq("a", "b", "a", "c", "b", "a")
    val cand = spark.sparkContext.parallelize(rows, 3).toDF("tok")
      .agg(HeavyKeep.of(col("tok"), 8).as("cand"))
      .collect()(0).getSeq[String](0)
    assert(cand.sorted === Seq("a", "b", "c"), "no decrement ever fires below k")
  }
}

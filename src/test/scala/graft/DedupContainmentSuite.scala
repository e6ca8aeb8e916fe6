package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `dedup_containment` vs an independent driver-side brute force over the
  * fixture corpus: shingle sets recomputed with plain Scala collections
  * (trim/split/sliding — none of the engine's expression machinery), every
  * doc pair intersected directly, thresholds reapplied. Catches inverted-
  * index bugs (df-cap over-dropping, join direction, per-mille arithmetic)
  * that the DuckDB oracle — which shares the inverted-index formulation —
  * could miss. */
class DedupContainmentSuite extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("dedup-containment")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = spark.stop()

  /** The operator's shingle definition, re-derived from first principles. */
  private def shingles(text: String): Set[String] = {
    val toks = text.trim.split("\\s+").toSeq
    if (toks.length < 3) Set(text.trim)
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  test("operator output equals a driver-side brute force over all pairs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1))).toMap

    val expected = (for {
      (a, sa) <- docs.iterator
      (b, sb) <- docs.iterator
      if a != b && sa.size >= 5
      common = (sa & sb).size
      if common * 100 >= sa.size * 80
    } yield (a, b, common.toLong, sa.size.toLong, common * 1000L / sa.size)).toSet

    val got = operators.Dedup.dedup_containment(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    assert(got === expected,
      s"containment mismatch: only-got ${(got -- expected).take(3)}, " +
        s"only-expected ${(expected -- got).take(3)}")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.SubstrHashes]] vs the interpreted SQL pipeline it
  * replaces — the same spec-equivalence pattern as `WordShinglesSuite`: the
  * kernel must produce bit-identical (pos, h) rows to
  * `transform(sequence(...), i -> struct(i, conv(substring(md5(substring(
  * t, i, L)), 1, 15), 16, 10)))` on fixture text AND on adversarial inputs
  * (multi-byte codepoints, exact-boundary lengths) the ASCII fixtures
  * cannot reach. */
class SubstrHashesSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("substr-hashes")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = spark.stop()

  private def sqlPipeline(l: Int) = expr(
    s"transform(sequence(1, length(t) - ${l - 1}), i -> " +
      s"struct(i AS pos, CAST(conv(substring(md5(substring(t, i, $l)), 1, 15), 16, 10) AS BIGINT) AS h))")

  test("kernel equals the interpreted SQL pipeline on the document fixture") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(regexp_replace(trim(col("text")), "\\s+", " ").as("t"))
      .filter(length(col("t")) >= 50)
    val diff = docs
      .select(graft.functions.SubstrHashes.of(col("t"), 50).as("a"),
        sqlPipeline(50).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff === 0L, "kernel diverged from the SQL spec on fixture text")
  }

  test("kernel matches SQL semantics on multi-byte and boundary inputs") {
    val s = spark; import s.implicits._
    val cases = Seq(
      "café résumé naïve 你好世界 one two",
      "abc",                       // shorter than the window
      "abcde",                     // exactly the window
      "a" * 6,                     // one past the window
      "😀😁abcdef") // surrogate pairs
    val df = cases.toDF("t")
    val diff = df
      .select(col("t"), graft.functions.SubstrHashes.of(col("t"), 5).as("a"),
        expr("CASE WHEN length(t) >= 5 THEN " +
          "transform(sequence(1, length(t) - 4), i -> " +
          "struct(i AS pos, CAST(conv(substring(md5(substring(t, i, 5)), 1, 15), 16, 10) AS BIGINT) AS h)) " +
          "ELSE array() END").as("b"))
      .filter(col("a") =!= col("b"))
      .collect()
    assert(diff.isEmpty, s"diverging inputs: ${diff.map(_.getString(0)).mkString("; ")}")
  }
}

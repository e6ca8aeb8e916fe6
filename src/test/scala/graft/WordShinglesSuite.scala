package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The compiled [[graft.functions.WordShingles]] kernel must be
  * value-identical to the SQL pipeline it replaces (`Dedup.shinglesS`),
  * which the DuckDB oracle still runs — on the fixture corpus and on the
  * whitespace/short-text edge cases. */
class WordShinglesSuite extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-word-shingles")
    .config("spark.sql.shuffle.partitions", "4")
    .config(Tables.nanosConf._1, Tables.nanosConf._2)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    val diff = df
      .select(
        functions.WordShingles.of(col("text"), 3).as("fast"),
        expr(operators.Dedup.shinglesS).as("ref"))
      .filter(not(col("fast") <=> col("ref")))
    assert(diff.count() === 0, diff.take(3).mkString("; "))
  }

  test("matches the SQL pipeline on the fixture corpus") {
    check(Tables.documents(spark, "/root/testdata/sf0.001"))
  }

  test("matches the SQL pipeline on 500 random whitespace-heavy strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(12345)
    val alphabet = "ab \t\ncd e  fé " // repeated runs of mixed whitespace + accents
    val strs = Seq.fill(500)(
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    check(strs.toDF("text"))
  }

  test("matches the SQL pipeline on whitespace and short-text edges") {
    import spark.implicits._
    val edges = Seq(
      "", " ", "one", "one two", "one two three",
      "  leading and trailing  ", "tab\tseparated\ttokens here",
      "newline\nin the middle", "a  b   c d", "x y z w", // NBSP is not \s
      "repeat repeat repeat repeat repeat"
    ).toDF("text")
    check(edges)
  }

  /** [[graft.functions.WordShingleHashes]] must equal hash-of-the-string-
    * shingles as a SET: same distinct 60-bit values the DuckDB oracle
    * states with `list_distinct(list_transform(sh, s -> ...))`, and the
    * same h60 discipline as `Dedup.h60S`. */
  private def checkHashed(df: org.apache.spark.sql.DataFrame): Unit = {
    val refExpr =
      """array_distinct(transform(ref_sh, s ->
        |  CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)))""".stripMargin
    val diff = df
      .select(
        functions.WordShingleHashes.of(col("text"), 3).as("fast"),
        functions.WordShingles.of(col("text"), 3).as("ref_sh"))
      .select(col("fast"), expr(refExpr).as("ref"))
      .filter(not(array_sort(col("fast")) <=> array_sort(col("ref"))))
    assert(diff.count() === 0, diff.take(3).mkString("; "))
  }

  test("WordShingleHashes = distinct h60 of the string shingles, fixture corpus") {
    checkHashed(Tables.documents(spark, "/root/testdata/sf0.001"))
  }

  test("WordShingleHashes matches on whitespace and short-text edges") {
    import spark.implicits._
    checkHashed(Seq(
      "", " ", "one", "one two", "one two three",
      "  leading and trailing  ", "tab\tseparated\ttokens here",
      "newline\nin the middle", "a  b   c d", "x y z w",
      "repeat repeat repeat repeat repeat", "héllo wörld multibyte shingle"
    ).toDF("text"))
  }

  private def checkChar(df: org.apache.spark.sql.DataFrame): Unit = {
    val diff = df
      .select(
        functions.CharShingles.of(col("text"), 3).as("fast"),
        expr("""CASE WHEN length(text) < 3 THEN array(text)
               |ELSE transform(sequence(1, length(text) - 2), i -> substring(text, i, 3)) END"""
          .stripMargin).as("ref"))
      .filter(not(col("fast") <=> col("ref")))
    assert(diff.count() === 0, diff.take(3).mkString("; "))
  }

  test("CharShingles matches the interpreted pipeline on the fixture corpus") {
    checkChar(Tables.documents(spark, "/root/testdata/sf0.001"))
  }

  test("CharShingles matches on multibyte and short-text edges") {
    import spark.implicits._
    // duplicates kept, document order, codepoint (not byte) windows
    checkChar(Seq(
      "", "a", "ab", "abc", "abcd", "aaaaaa", "héllo wörld", "日本語のテキスト",
      " x ", "ab\ncd", "tab\tx"
    ).toDF("text"))
  }
}

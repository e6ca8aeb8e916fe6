package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface registered by [[GraftExtensions]]: every native graft
  * expression callable from plain SQL text on a session built with the
  * extension (`spark.sql.extensions=graft.GraftExtensions`). */
class GraftExtensionsSuite extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-extensions")
    .config("spark.sql.shuffle.partitions", "2")
    .withExtensions(new GraftExtensions)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("vec_dot from SQL") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r === 32.0)
  }

  test("word_shingles from SQL") {
    val r = spark.sql("SELECT word_shingles('a b c d c d e', 3) AS sh")
      .collect().head.getSeq[String](0)
    assert(r === Seq("a b c", "b c d", "c d c", "d c d", "c d e"))
  }

  test("char_shingles from SQL") {
    val r = spark.sql("SELECT char_shingles('abcdab', 3) AS sh")
      .collect().head.getSeq[String](0)
    assert(r === Seq("abc", "bcd", "cda", "dab"))
    val short = spark.sql("SELECT char_shingles('ab', 3) AS sh")
      .collect().head.getSeq[String](0)
    assert(short === Seq("ab"))
  }

  test("winnow_fp from SQL matches the DataFrame helper") {
    import org.apache.spark.sql.functions._
    val txt = "the quick brown fox jumps over the lazy dog"
    val viaSql = spark.sql(s"SELECT winnow_fp('$txt', 5, 4, 1000003) AS fp")
      .collect().head.getString(0)
    val viaCol = spark.range(1).select(
      functions.Winnow.fp(lit(txt), 5, 4, 1000003L).as("fp"))
      .collect().head.getString(0)
    assert(viaSql === viaCol && viaSql.nonEmpty)
  }

  test("minhash_sig from SQL matches the DataFrame helper") {
    import org.apache.spark.sql.functions._
    val (as, bs) = functions.MinHashSig.coefficients(32, 42)
    val diff = spark.sql(
      "SELECT minhash_sig(word_shingles('a b c d e f g', 3), 32, 42) AS a")
      .withColumn("b", functions.MinHashSig.of(
        functions.WordShingles.of(lit("a b c d e f g"), 3),
        as, bs, functions.MinHashSig.Prime))
      .filter(not(col("a") <=> col("b")))
    assert(diff.count() === 0)
  }

  test("vec_norm2 from SQL") {
    val r = spark.sql("SELECT vec_norm2(array(3.0D, 4.0D)) AS n2")
      .collect().head.getDouble(0)
    assert(r === 25.0)
  }

  test("vec_sum_long aggregates from SQL with group semantics") {
    val r = spark.sql(
      """SELECT g, vec_sum_long(v) AS s FROM VALUES
        |  (1, array(1L, 2L)), (1, array(10L, 20L)), (2, array(5L, 7L))
        |  AS t(g, v) GROUP BY g ORDER BY g""".stripMargin)
      .collect()
    assert(r(0).getSeq[Long](1) === Seq(11L, 22L))
    assert(r(1).getSeq[Long](1) === Seq(5L, 7L))
  }

  test("lsh_bits from SQL matches the operator's bucketCol") {
    import org.apache.spark.sql.functions._
    val vec = Seq(0.9f, -0.3f, 0.2f, -0.8f)
    val viaSql = spark.sql(
      s"SELECT lsh_bits(array(${vec.mkString("F,")}F), 8) AS b")
      .collect().head.getLong(0)
    val viaCol = spark.range(1)
      .select(operators.Lsh.bucketCol(8,
        lit(vec.toArray).cast("array<float>")).as("b"))
      .collect().head.getLong(0)
    assert(viaSql === viaCol)
  }

  test("substr_hashes from SQL matches the Column helper") {
    import org.apache.spark.sql.functions._
    val txt = "abcdefghijklmnop"
    val viaSql = spark.sql(s"SELECT substr_hashes('$txt', 5) AS h")
      .collect().head.getSeq[Long](0)
    val viaCol = spark.range(1)
      .select(functions.SubstrHashes.of(lit(txt), 5).as("h"))
      .collect().head.getSeq[Long](0)
    assert(viaSql === viaCol)
    assert(viaSql.length === txt.length - 5 + 1)
  }

  test("heavy_keep aggregates from SQL: the frequent token survives") {
    val r = spark.sql(
      """SELECT heavy_keep(t, 2) AS hh FROM VALUES
        |  ('a'), ('a'), ('a'), ('b'), ('c'), ('a') AS v(t)""".stripMargin)
      .collect().head.getSeq[String](0)
    assert(r.contains("a"))
    assert(r.length <= 2)
  }

  test("kmin_distinct and bottomk_sample aggregate from SQL") {
    val km = spark.sql(
      """SELECT kmin_distinct(h, 3) AS sk FROM VALUES
        |  (50L), (10L), (30L), (10L), (40L), (20L) AS v(h)""".stripMargin)
      .collect().head.getSeq[Long](0)
    assert(km === Seq(10L, 20L, 30L))
    val bk = spark.sql(
      """SELECT bottomk_sample(h, x, 2) AS s FROM VALUES
        |  (50L, 500L), (10L, 100L), (30L, 300L) AS v(h, x)""".stripMargin)
      .collect().head.getSeq[Long](0)
    assert(bk === Seq(100L, 300L))
  }

  test("non-literal size argument is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles('a b c', 1 + 2)").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      Option(e.getCause).exists(_.getMessage.contains("integer literal")))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The compiled [[graft.functions.MinHashSig]] kernel must be
  * value-identical to the interpreted aggregate/zip_with fold it replaces
  * (which the DuckDB oracle still mirrors): one md5-derived 28-bit base hash
  * per shingle, folded through the affine permutation family mod 2^31-1. */
class MinHashSigSuite extends AnyFunSuite with BeforeAndAfterAll {

  private val NumHashes = 32
  private val (as, bs) = functions.MinHashSig.coefficients(NumHashes, 42)
  private val p = functions.MinHashSig.Prime

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-minhash-sig")
    .config("spark.sql.shuffle.partitions", "4")
    .config(Tables.nanosConf._1, Tables.nanosConf._2)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The interpreted SQL fold the kernel replaced, verbatim. */
  private val foldSql: String = {
    val aArr = as.mkString("array(", "L,", "L)")
    val bArr = bs.mkString("array(", "L,", "L)")
    s"""aggregate(
       |  transform(sh, s -> CAST(conv(substring(md5(s), 1, 7), 16, 10) AS BIGINT)),
       |  transform(sequence(1, $NumHashes), j -> CAST($p AS BIGINT)),
       |  (acc, h) -> zip_with(acc, sequence(0, ${NumHashes - 1}), (m, j) ->
       |    least(m, (element_at($aArr, j + 1) * h + element_at($bArr, j + 1)) % $p)))""".stripMargin
  }

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    val diff = df
      .select(functions.WordShingles.of(col("text"), 3).as("sh"))
      .select(
        functions.MinHashSig.of(col("sh"), as, bs, p).as("fast"),
        expr(foldSql).as("ref"))
      .filter(not(col("fast") <=> col("ref")))
    assert(diff.count() === 0, diff.take(3).mkString("; "))
  }

  test("matches the interpreted fold on the fixture corpus") {
    check(Tables.documents(spark, "/root/testdata/sf0.001"))
  }

  test("matches the interpreted fold on random short strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(98765)
    val alphabet = "abc def gh \t ij"
    val strs = Seq.fill(300)(
      (0 until rnd.nextInt(50)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    check(strs.toDF("text"))
  }

  test("hashed-shingle input yields the identical signature (h28 = h60 >>> 32)") {
    val diff = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(
        functions.WordShingles.of(col("text"), 3).as("sh"),
        functions.WordShingleHashes.of(col("text"), 3).as("hs"))
      .select(
        functions.MinHashSig.of(col("sh"), as, bs, p).as("fromStrings"),
        functions.MinHashSig.of(col("hs"), as, bs, p).as("fromHashes"))
      .filter(not(col("fromStrings") <=> col("fromHashes")))
    assert(diff.count() === 0, diff.take(3).mkString("; "))
  }

  test("empty shingle set yields the init vector; null input yields null") {
    import spark.implicits._
    val out = Seq((Seq.empty[String], 1), (null, 2)).toDF("sh", "tag")
      .select(col("tag"), functions.MinHashSig.of(col("sh"), as, bs, p).as("sig"))
      .collect().sortBy(_.getInt(0))
    assert(out(0).getSeq[Long](1) === Seq.fill(NumHashes)(p))
    assert(out(1).isNullAt(1))
  }

  test("null shingle elements leave the minima untouched") {
    import spark.implicits._
    val withNull = Seq(Seq("a b c", null, "d e f")).toDF("sh")
    val without = Seq(Seq("a b c", "d e f")).toDF("sh")
    val a = withNull.select(functions.MinHashSig.of(col("sh"), as, bs, p)).head.getSeq[Long](0)
    val b = without.select(functions.MinHashSig.of(col("sh"), as, bs, p)).head.getSeq[Long](0)
    assert(a === b)
  }

}

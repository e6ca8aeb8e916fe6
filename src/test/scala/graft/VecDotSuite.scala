package graft

import graft.functions.VecDot
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class VecDotSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("vecdot")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = spark.stop()

  private def hofDot = expr(
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0d, (acc, v) -> acc + v)")

  test("float arrays: bit-identical to the interpreted HOF formulation") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(100)((Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(VecDot.dot(col("a"), col("b")).as("fast"), hofDot.as("ref"))
    // exact equality: both sum the same widened products in index order
    assert(df.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("double arrays and mixed float/double literals") {
    val s = spark; import s.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
      .select(VecDot.dot(col("a"), col("b")).as("d"),
        VecDot.norm2(col("a")).as("n2"),
        VecDot.dot(col("a"), typedLit(Array(1.0, 1.0, 1.0))).as("lit"))
    val r = df.head()
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === 14.0)
    assert(r.getDouble(2) === 6.0)
  }

  test("null array and null element yield null") {
    val s = spark; import s.implicits._
    val df = Seq(
      (Some(Array[java.lang.Float](1.0f, 2.0f)), None: Option[Array[java.lang.Float]]),
      (Some(Array[java.lang.Float](1.0f, null)), Some(Array[java.lang.Float](3.0f, 4.0f))))
      .toDF("a", "b")
      .select(VecDot.dot(col("a"), col("b")).as("d"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("interpreted eval matches codegen") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((Array.fill(16)(rnd.nextFloat()), Array.fill(16)(rnd.nextFloat())))
    val df = rows.toDF("a", "b")
    val fast = df.select(VecDot.dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    // force interpreted path by evaluating the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val interp = rows.map { case (a, b) =>
      VecDot(
        Literal(ArrayData.toArrayData(a), ArrayType(FloatType)),
        Literal(ArrayData.toArrayData(b), ArrayType(FloatType))).eval(null).asInstanceOf[Double]
    }
    assert(fast.toSeq === interp)
  }
}

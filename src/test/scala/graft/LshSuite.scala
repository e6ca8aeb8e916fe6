package graft

import graft.operators.Lsh
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The configurable LSH bucket-count ceiling: code width derives from corpus
  * size with `spark.graft.lsh.maxBits` as the saturation point, weight rows
  * are prefix-stable as the ceiling grows, and buckets computed at widths
  * PAST the old fixed cap match a from-scratch reimplementation. */
class LshSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("lsh")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = spark.stop()

  test("numBits grows past the default ceiling when the config allows it") {
    val n = 64L << 22 // = TargetBucket * 2^22 vectors
    assert(Lsh.numBits(n) === Lsh.DefaultMaxBits, "default ceiling clamps at 20")
    assert(Lsh.numBits(n, maxBits = 24) === 22, "raised ceiling admits the true width")
    assert(Lsh.numBits(500) === 4, "fixture-scale floor unchanged")
  }

  test("maxBits reads the session config and rejects nonsense") {
    val s2 = spark.newSession()
    assert(Lsh.maxBits(s2) === Lsh.DefaultMaxBits)
    s2.conf.set(Lsh.MaxBitsConf, "24")
    assert(Lsh.maxBits(s2) === 24)
    s2.conf.set(Lsh.MaxBitsConf, "63")
    intercept[IllegalArgumentException](Lsh.maxBits(s2))
  }

  test("weight rows are prefix-stable as the ceiling widens") {
    val w20 = Lsh.weights.map(_.clone) // default-ceiling rows
    val w24 = Lsh.weightsFor(24)
    assert(w24.length >= 24)
    (0 until Lsh.DefaultMaxBits).foreach { k =>
      assert(w24(k).toSeq === w20(k).toSeq,
        s"row $k changed when the ceiling grew — existing buckets would rehash")
    }
  }

  test("sim_knn_graph restricted to sim_topk_lsh's query set is identical") {
    val dir = "/root/testdata/sf0.001"
    // same LSH width, same probe set, same k, same tiebreak — the graph's
    // rows for the topk query nodes must BE the topk result; any drift means
    // the self-join formulation diverged from the broadcast formulation
    val g = operators.Similarity.sim_knn_graph(spark, dir)
      .filter(col("src") < 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val t = operators.Similarity.sim_topk_lsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(g === t)
  }

  test("bucketCol at width 22 (past the old cap) matches a direct recompute") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val embs = Seq.fill(8)(Array.fill(Lsh.Dim)(rnd.nextFloat() * 2f - 1f))
    val nb = 22
    val got = embs.zipWithIndex.toDF("embedding", "i")
      .select(col("i"), Lsh.bucketCol(nb, col("embedding")).as("blk"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val w = Lsh.weightsFor(nb)
    embs.zipWithIndex.foreach { case (e, i) =>
      var expect = 0L
      (0 until nb).foreach { k =>
        // integer-exact model: quantize once, sum ±1-weighted longs
        val dot = (0 until Lsh.Dim)
          .map(d => math.floor(e(d).toDouble * Lsh.QuantScale).toLong * w(k)(d)).sum
        if (dot >= 0L) expect |= 1L << k
      }
      assert(got(i) === expect, s"embedding $i bucket mismatch at width $nb")
    }
  }

  test("LshBits participates in whole-stage codegen (no interpreted fallback)") {
    // a parquet-backed plan: a local relation would be constant-folded by
    // ConvertToLocalRelation (interpreted eval) and never reach codegen
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(Lsh.bucketCol(4, col("embedding")).as("blk"))
    val cg = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    // the quantize+sign loops must appear inside a compiled WholeStageCodegen
    // subtree — a doGenCode failure would silently fall back to interpreted
    // eval and only show up as a perf cliff on the whole LSH family
    assert(cg.contains("WholeStageCodegen subtrees") && !cg.startsWith("Found 0"),
      s"no codegen subtree:\n${cg.take(300)}")
    assert(cg.contains("Math.floor"), s"LshBits body missing from generated code:\n${cg.take(500)}")
  }

  test("bucket sign test is integer-exact: no double-sum ambiguity near zero") {
    val s = spark; import s.implicits._
    // a vector whose double-summed dot with row 0 is ~0 (sign order-dependent)
    // must still bucket deterministically under the quantized test
    val w0 = Lsh.weights(0)
    val e = Array.tabulate(Lsh.Dim)(d => (w0(d) * 1e-9f) * (if (d % 2 == 0) 1f else -1f))
    val got = Seq((e, 0)).toDF("embedding", "i")
      .select(Lsh.bucketCol(4, col("embedding")).as("blk"))
      .head().getLong(0)
    val w = Lsh.weightsFor(4)
    var expect = 0L
    (0 until 4).foreach { k =>
      val dot = (0 until Lsh.Dim)
        .map(d => math.floor(e(d).toDouble * Lsh.QuantScale).toLong * w(k)(d)).sum
      if (dot >= 0L) expect |= 1L << k
    }
    assert(got === expect)
  }
}

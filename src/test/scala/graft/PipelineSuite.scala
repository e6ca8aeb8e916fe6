package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The broadcast size-gate on [[Pipeline.pipe_decontaminate]]: a normal-size
  * eval set is broadcast (the production fast path), an oversized one falls
  * back to a shuffle join instead of OOMing the driver — and both paths
  * produce identical pairs. */
class PipelineSuite extends AnyFunSuite with BeforeAndAfterAll
    with AdaptiveSparkPlanHelper {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-pipeline")
    .config("spark.sql.shuffle.partitions", "4")
    // disable Catalyst's own size-based broadcast so the plan shape below
    // reflects ONLY the operator's explicit gate decision
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def broadcastJoins(plan: SparkPlan): Int =
    collect(plan) { case b: BroadcastHashJoinExec => b }.size

  test("small eval set broadcasts; oversized eval set degrades to a shuffle join") {
    spark.conf.unset(Pipeline.BroadcastMaxEvalBytes)
    val viaBroadcast = Pipeline.pipe_decontaminate(spark, sfDir)
    assert(broadcastJoins(viaBroadcast.queryExecution.executedPlan) === 1,
      "default threshold must take the broadcast path")

    spark.conf.set(Pipeline.BroadcastMaxEvalBytes, "0")
    val viaShuffle = Pipeline.pipe_decontaminate(spark, sfDir)
    assert(broadcastJoins(viaShuffle.queryExecution.executedPlan) === 0,
      "zero threshold must take the shuffle path")

    val a = viaBroadcast.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = viaShuffle.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b, "both paths must produce identical contamination pairs")
    assert(a.nonEmpty, "fixture must produce at least one contaminated pair")
    spark.conf.unset(Pipeline.BroadcastMaxEvalBytes)
  }

  test("gate pivots exactly on the parquet-footer uncompressed text estimate") {
    val est = Pipeline.evalTextBytesEstimate(spark, sfDir)
    // sanity: the footer estimate tracks the actual eval text bytes tightly
    // (the only residual error is the eval slice's deviation from the column
    // average — no compression-ratio guess), unlike the former ×4-over-file
    // heuristic which could undershoot by the corpus's compression ratio
    val actual = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter("doc_id % 20 = 0")
      .selectExpr("sum(octet_length(text))").collect()(0).getLong(0)
    assert(est >= actual / 2 && est <= actual * 2,
      s"estimate $est should be metadata-faithful to actual eval bytes $actual")

    // threshold exactly at the estimate -> broadcast; one byte under -> shuffle
    spark.conf.set(Pipeline.BroadcastMaxEvalBytes, est.toString)
    assert(broadcastJoins(
      Pipeline.pipe_decontaminate(spark, sfDir).queryExecution.executedPlan) === 1,
      "threshold == estimate must broadcast")
    spark.conf.set(Pipeline.BroadcastMaxEvalBytes, (est - 1).toString)
    assert(broadcastJoins(
      Pipeline.pipe_decontaminate(spark, sfDir).queryExecution.executedPlan) === 0,
      "threshold one byte under the estimate must take the shuffle path")
    spark.conf.unset(Pipeline.BroadcastMaxEvalBytes)
  }

  test("pipe_e2e rollup is consistent with its component operators") {
    import org.apache.spark.sql.functions.col
    val e2e = Pipeline.pipe_e2e(spark, sfDir).collect()
    assert(e2e.nonEmpty)
    assert(e2e.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    // the rollup's doc total must equal the set algebra it claims:
    // quality-ok reps, minus the eval slice, minus contaminated train docs
    val contaminated = Pipeline.pipe_decontaminate(spark, sfDir)
      .select(col("train_doc_id").as("doc_id")).distinct()
    val expected = Pipeline.pipe_corpus(spark, sfDir)
      .filter(col("doc_id") % 20 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .count()
    assert(e2e.map(_.getLong(2)).sum === expected)
    assert(e2e.forall(_.getLong(3) > 0), "token totals must be positive")
  }

  test("pipe_chunk: full coverage, exact stride, tail-shortened last window") {
    import org.apache.spark.sql.functions.{col, size, split, trim}
    val tokenCounts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = Pipeline.pipe_chunk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4)))
      .groupBy(_._1)
    assert(chunks.keySet === tokenCounts.keySet, "every doc chunked")
    chunks.foreach { case (id, rows) =>
      val n = tokenCounts(id)
      val sorted = rows.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, idx, start, len), i) =>
        assert(idx === i, s"doc $id chunk indices must be dense from 0")
        assert(start === i * 24, s"doc $id chunk $i stride")
        assert(len === math.min(32, n - start), s"doc $id chunk $i length")
        assert(len > 0, s"doc $id chunk $i must be non-empty")
      }
      val (_, _, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen === n, s"doc $id last chunk must end at the tail")
      assert(sorted.length === 1 + math.max(0, math.ceil((n - 32) / 24.0).toInt),
        s"doc $id chunk count")
    }
  }

  test("pipe_split: total, determinism, and hash-faithful assignment") {
    val a = Pipeline.pipe_split(spark, sfDir).collect()
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(a.length === total, "every document gets exactly one split")
    assert(a.map(_.getString(2)).toSet.subsetOf(Set("train", "val", "test")))

    // deterministic: a second evaluation assigns identically
    val b = Pipeline.pipe_split(spark, sfDir).collect()
    assert(a.map(r => r.getLong(0) -> r.getString(2)).toMap ===
      b.map(r => r.getLong(0) -> r.getString(2)).toMap)

    // hash-faithful: recompute one doc's bucket with java.security directly
    val r0 = a.minBy(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(r0.getLong(0).toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val bucket = java.lang.Long.parseLong(hex, 16)
    val expected =
      if (bucket * 10L < 9L * 4294967296L) "train"
      else if (bucket * 20L < 19L * 4294967296L) "val"
      else "test"
    assert(r0.getString(2) === expected,
      s"doc ${r0.getLong(0)} bucket $bucket must land in $expected")

    // 90/5/5 within loose binomial bounds at fixture scale
    val frac = a.count(_.getString(2) == "train").toDouble / total
    assert(frac > 0.8 && frac < 0.97, s"train fraction $frac far from 0.9")
  }
}

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
}

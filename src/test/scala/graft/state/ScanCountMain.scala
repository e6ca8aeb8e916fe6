package graft.state

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Dev-only: executed-plan distinct physical scan count for one gate query
  * (the PlanShapeSuite metric, runnable ad hoc).
  * usage: Test/runMain graft.state.ScanCountMain <queryName> [sfDir] */
object ScanCountMain extends AdaptiveSparkPlanHelper {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(graft.Tables.nanosConf._1, graft.Tables.nanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    println(s"[scan-count] $name distinct=" +
      scans.map(System.identityHashCode).distinct.size +
      " total-refs=" + scans.size)
    spark.stop()
  }
}

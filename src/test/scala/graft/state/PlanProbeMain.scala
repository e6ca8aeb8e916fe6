package graft.state

import org.apache.spark.sql.SparkSession

/** Dev-only: print the formatted physical plan of one gate query.
  * usage: runMain graft.state.PlanProbeMain <queryName> [sfDir] */
object PlanProbeMain {
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
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}

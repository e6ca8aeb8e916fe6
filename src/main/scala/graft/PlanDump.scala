package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a comma-separated list of SparkEntry
  * queries into `<outDir>/<name>_<tag>.txt` — the round's plan-evidence
  * artifacts (plans/r16/<query>_before.txt / _after.txt). Streaming gates
  * return their sink/output table, so their files show the post-run read
  * plan; the streaming plan evidence for those lives in the code and the
  * per-batch probe numbers instead. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val tag = args(1)
    val outDir = if (args.length > 2) args(2) else "plans/r16"
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"), plan)
      println(s"[plandump] wrote $outDir/${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
    sys.exit(0)
  }
}

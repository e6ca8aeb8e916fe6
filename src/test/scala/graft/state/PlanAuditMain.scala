package graft.state

/** Scratch plan audit (not a test): prints formatted plans for spot checks
  * of pushdown / broadcast / codegen. */
object PlanAuditMain {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config(graft.Tables.nanosConf._1, graft.Tables.nanosConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    args.foreach { name =>
      println(s"===== $name =====")
      val plan = graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      println(plan.take(3500))
    }
    spark.stop()
  }
}

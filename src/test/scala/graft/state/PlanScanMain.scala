package graft.state

/** Scratch plan scanner (not a test): one summary line per BATCH gate query
  * — exchange count, join strategies, and scale red flags (cartesian
  * products, nested-loop joins, truncated "... N more fields" giant
  * aggregation buffers like the round-7 q9 mixed-HLL regression, sort
  * aggregates). Streaming entries are excluded: constructing them runs a
  * real streaming query.
  */
object PlanScanMain {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config(graft.Tables.nanosConf._1, graft.Tables.nanosConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = graft.SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("stream_"))
    names.foreach { n =>
      try {
        val p = graft.SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString
        def c(s: String): Int = s.r.findAllIn(p).length
        val flags = Seq(
          if (p.contains("CartesianProduct")) "CARTESIAN" else "",
          if (p.contains("BroadcastNestedLoopJoin")) "BNLJ" else "",
          if (p.contains("more fields")) "WIDE-BUFFER" else "",
          if (p.contains("SortAggregate")) "SORT-AGG" else ""
        ).filter(_.nonEmpty)
        println(f"$n%-28s exch=${c("Exchange hashpartitioning")}%2d bhj=${c("BroadcastHashJoin")}%2d smj=${c("SortMergeJoin")}%2d ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"$n  ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}

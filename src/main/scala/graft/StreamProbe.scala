package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Ad-hoc streaming perf probe: run one named stream_* query from SparkEntry
  * while a listener captures every micro-batch's `durationMs` breakdown
  * (triggerExecution, addBatch, getBatch, walCommit, commitOffsets,
  * queryPlanning, ...) plus state-store metrics, so optimization targets the
  * component that actually costs time (guide §1: measure first). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[probe] query started ${e.name} at ${System.nanoTime() / 1e9}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        val state = Option(p.stateOperators).map(_.toSeq).getOrElse(Nil).map { so =>
          s"commitMs=${so.commitTimeMs} rowsUpd=${so.numRowsUpdated} mem=${so.memoryUsedBytes}"
        }.mkString(" | ")
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${dur.get("triggerExecution")} addBatch=${dur.get("addBatch")} " +
          s"getBatch=${dur.get("getBatch")} latestOffset=${dur.get("latestOffset")} " +
          s"walCommit=${dur.get("walCommit")} commitOffsets=${dur.get("commitOffsets")} " +
          s"planning=${dur.get("queryPlanning")} state[$state]")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[probe] query terminated at ${System.nanoTime() / 1e9}")
    }
    spark.streams.addListener(listener)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name run $i total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
    sys.exit(0)
  }
}

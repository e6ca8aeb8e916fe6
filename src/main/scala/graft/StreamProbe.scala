package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Conf-registered listener (`spark.sql.streaming.streamingQueryListeners`)
  * so the cloned sessions the gate queries run on still report progress. */
class ProbeListener extends StreamingQueryListener {
  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    println(f"[probe] started ${e.name} @${System.nanoTime() / 1e9}%.2f")
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val dur = p.durationMs
    val state = Option(p.stateOperators).map(_.toSeq).getOrElse(Nil).map { so =>
      s"commitMs=${so.commitTimeMs} upd=${so.numRowsUpdated}"
    }.mkString("|")
    println(s"[probe] b=${p.batchId} rows=${p.numInputRows} " +
      s"trig=${dur.get("triggerExecution")} add=${dur.get("addBatch")} " +
      s"get=${dur.get("getBatch")} off=${dur.get("latestOffset")} " +
      s"wal=${dur.get("walCommit")} co=${dur.get("commitOffsets")} " +
      s"plan=${dur.get("queryPlanning")} st[$state]")
  }
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    println(f"[probe] terminated @${System.nanoTime() / 1e9}%.2f")
}

/** Ad-hoc streaming perf probe: run one named stream_* query from SparkEntry
  * while [[ProbeListener]] captures every micro-batch's `durationMs`
  * breakdown (triggerExecution, addBatch, getBatch, walCommit, commitOffsets,
  * queryPlanning, ...) plus state-store commit times, so optimization targets
  * the component that actually costs time (guide §1: measure first). */
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
      .config("spark.sql.streaming.streamingQueryListeners", classOf[ProbeListener].getName)
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name run $i total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
    sys.exit(0)
  }
}

package graft.state

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Typed refusal for the offline state tools: the target checkpoint looks
  * LIVE (a query appears to hold it). Catch-able by orchestration code and
  * distinguishable from genuine corruption errors. */
class CheckpointActiveException(msg: String) extends IllegalStateException(msg)

/** Live-checkpoint guard for the offline state-ops tools
  * ([[StateRepartition]], [[StateCompact]], [[StateGc]] under `--apply`):
  * all three assume the checkpoint is QUIESCENT — migrating or sweeping a
  * checkpoint while a query commits batches into it reads an inconsistent
  * snapshot (repartition/compact) or races a snapshot upload (gc). Nothing
  * used to refuse; an operator pointing cron at the wrong path found out
  * from downstream corruption.
  *
  * Structured Streaming takes no cross-JVM lease on its checkpoint, so the
  * strongest available signal is recency: an active query writes its
  * `offsets` and `commits` batch logs every micro-batch, so a batch-log
  * file younger than the quiescence window means a writer very likely
  * holds the checkpoint. The check is ADVISORY (mtimes, not locks) —
  * `--force` / `force = true` overrides it for an operator who knows the
  * query is stopped, and `spark.graft.stateops.quiesceMs` tunes the window
  * (0 disables; harness code that stops its own query seconds before
  * invoking a tool sets it to 0). */
object CheckpointGuard {

  /** Session conf: quiescence window in milliseconds (0 disables). */
  val QuiesceConf = "spark.graft.stateops.quiesceMs"
  val DefaultQuiesceMs = 60000L

  private def quiesceMs(spark: SparkSession): Long =
    spark.conf.getOption(QuiesceConf).map(_.trim.toLong).getOrElse(DefaultQuiesceMs)

  /** Throw [[CheckpointActiveException]] iff a batch-log file under
    * `ckptDir` was modified within the quiescence window (and neither
    * `force` nor a zero window waives the check). A checkpoint with no
    * batch logs passes — the tool's own validation owns that error. */
  def assertQuiescent(spark: SparkSession, ckptDir: String, tool: String,
      force: Boolean): Unit = {
    if (force) return
    val window = quiesceMs(spark)
    if (window <= 0) return
    val root = new Path(ckptDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val newest = Seq("commits", "offsets").flatMap { d =>
      val p = new Path(root, d)
      if (fs.exists(p)) fs.listStatus(p).toSeq.map(_.getModificationTime) else Nil
    }
    newest.maxOption.map(System.currentTimeMillis() - _).filter(_ < window)
      .foreach { age =>
        throw new CheckpointActiveException(
          s"$tool: checkpoint $ckptDir looks LIVE — a batch log was written " +
            s"$age ms ago (quiescence window $window ms). Stop the query " +
            s"first; if you know it is stopped, pass --force (CLI) / " +
            s"force = true (API), or set $QuiesceConf=0.")
      }
  }
}

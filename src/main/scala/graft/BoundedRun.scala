package graft

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import scala.util.Try

import org.apache.spark.sql.SparkSession

/** Wall-clock guard for harness query execution (round-7 postmortem: one
  * wedged query zeroed the ENTIRE round's correctness artifact and timed out
  * the bench — a single failure must degrade to a single FAIL row).
  *
  * The body runs on a daemon thread; on timeout the thread is abandoned
  * (native RocksDB calls are not interruptible), every active streaming
  * query in the root session is stopped and all running jobs cancelled so a
  * stuck query cannot starve the ones after it, and the caller gets None —
  * the loop moves on to the next query instead of wedging the artifact.
  */
object BoundedRun {
  def apply[A](spark: SparkSession, name: String, timeoutSecs: Long)(body: => A): Option[A] =
    attempt(spark, name, timeoutSecs)(body).toOption

  /** Like `apply`, but a failure carries WHY (exception string or timeout
    * marker) so callers can persist a per-query error artifact — a silent
    * absence in `CORRECTNESS_r*.json` cost round 8 a from-scratch diagnosis
    * of 26 missing rows. */
  def attempt[A](spark: SparkSession, name: String, timeoutSecs: Long)(body: => A): Either[String, A] = {
    val result = new LinkedBlockingQueue[Either[Throwable, A]](1)
    val t = new Thread(
      () => try result.put(Right(body))
            catch { case e: Throwable => result.put(Left(e)) },
      s"graft-bounded-$name")
    t.setDaemon(true) // must not block JVM exit if wedged in native code
    t.start()
    result.poll(timeoutSecs, TimeUnit.SECONDS) match {
      case null =>
        System.err.println(s"[guard] $name exceeded ${timeoutSecs}s; abandoning it " +
          "(daemon thread left behind), cancelling its jobs")
        // Gates run on cloned sessions whose StreamingQueryManager is their
        // own, but cancelAllJobs on the SHARED SparkContext fails any
        // in-flight micro-batch, which terminates the stream too.
        // The abandoned thread may still be INSIDE a native RocksDB call:
        // providers must never free native handles under it — see the
        // lifetime contract in RocksDbStateStoreProvider (leak, don't close).
        Try(spark.streams.active.foreach(q => Try(q.stop())))
        Try(spark.sparkContext.cancelAllJobs())
        Left(s"TIMEOUT after ${timeoutSecs}s")
      case Left(e) =>
        System.err.println(s"[guard] $name failed: ${e.getMessage}")
        Left(s"${e.getClass.getName}: ${e.getMessage}")
      case Right(a) => Right(a)
    }
  }
}

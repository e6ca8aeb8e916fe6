package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** JVM-scoped staging-directory factory. Every gate/bench staging location —
  * staged corpus copies, stream input chunks, streaming checkpoints — is
  * created under ONE root that a single shutdown hook deletes recursively,
  * so repeated gate/bench JVM runs no longer accumulate full table copies
  * in the system temp dir. Concurrent first-callers racing a non-atomic
  * `TrieMap.getOrElseUpdate` can still stage twice, but the losing orphan
  * now lives under the managed root and is reclaimed at exit too.
  */
object Staging {
  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-staging-")
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteRecursively(r), "graft-staging-cleanup"))
    r
  }

  /** A fresh directory under the managed root; deleted at JVM exit. */
  def tempDir(prefix: String): Path = Files.createTempDirectory(root, prefix)

  private def deleteRecursively(p: Path): Unit =
    try {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(q => try { Files.deleteIfExists(q); () } catch { case _: Throwable => () })
      finally walk.close()
    } catch { case _: Throwable => () } // best-effort: exit cleanup must never throw
}

package graft.state

import java.io.{File, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.internal.Logging

import scala.util.Try

/** Durable snapshot I/O for one state store instance (operator × partition ×
  * store name).
  *
  * Snapshot format follows the reference (`RocksDbStateStoreProvider.scala:
  * 448-462, 517-566, 597-619`): one ZIP per committed version named
  * `state.snapshot.<version>` under the store's checkpoint directory on an
  * HDFS-compatible filesystem, containing the raw RocksDB files. Uploads go
  * through a temporary file + rename so a crashed commit never leaves a
  * half-written snapshot under the final name.
  *
  * At 100 TB the full-snapshot-per-batch model is O(state) upload per commit;
  * that matches the reference's contract and keeps recovery trivial
  * (download + unzip = exact DB). Changelog checkpointing is the planned
  * phase-2 upgrade (SURVEY §7.2 M6) and slots behind this same interface.
  */
final class SnapshotManager(baseDir: Path, hadoopConf: Configuration) extends Logging {

  private lazy val fs: FileSystem = baseDir.getFileSystem(hadoopConf)

  def ensureBaseDir(): Unit = fs.mkdirs(baseDir)

  /** Checkpoint-format v2 (state store checkpoint IDs) suffixes every
    * durable file with the commit's unique ID — `state.snapshot.<v>_<id>` —
    * so two commits of the same version (task retry, speculation) coexist
    * and recovery picks exactly the one the commit log recorded. v1 names
    * (`ckptId = None`) are unchanged. */
  private def suffixed(version: Long, ckptId: Option[String]): String =
    ckptId.fold(version.toString)(id => s"${version}_$id")

  def snapshotFile(version: Long, ckptId: Option[String] = None): Path =
    new Path(baseDir, s"state.snapshot.${suffixed(version, ckptId)}")
  def deltaFile(version: Long, ckptId: Option[String] = None): Path =
    new Path(baseDir, s"state.delta.${suffixed(version, ckptId)}")

  def snapshotExists(version: Long, ckptId: Option[String]): Boolean =
    fs.exists(snapshotFile(version, ckptId))

  private def parseVersion(name: String, prefix: String): Option[Long] =
    if (!name.startsWith(prefix)) None
    else Try(name.stripPrefix(prefix).takeWhile(_ != '_').toLong).toOption

  private def listByPrefix(prefix: String): Seq[Long] = {
    if (!fs.exists(baseDir)) return Nil
    fs.listStatus(baseDir).toSeq.flatMap(st => parseVersion(st.getPath.getName, prefix))
  }

  /** Commit IDs of the durable files at `version` (v2 names only). */
  def idsAt(version: Long, snapshot: Boolean): Seq[String] = {
    if (!fs.exists(baseDir)) return Nil
    val prefix = (if (snapshot) "state.snapshot." else "state.delta.") + version + "_"
    fs.listStatus(baseDir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix))
  }

  /** Versions with a durable full snapshot present (reference
    * `fetchVersions`, `:597-613`). */
  def listVersions(): Seq[Long] = listByPrefix("state.snapshot.")

  /** Versions with a durable changelog delta present. */
  def listDeltaVersions(): Seq[Long] = listByPrefix("state.delta.")

  /** Publish a local changelog file as `state.delta.<version>[_<id>]` (same
    * tmp+rename atomicity as snapshots). */
  def uploadDelta(local: File, version: Long, ckptId: Option[String] = None): Unit = {
    val target = deltaFile(version, ckptId)
    val tmp = new Path(baseDir, s".state.delta.$version.${System.nanoTime()}.tmp")
    val out = fs.create(tmp, true)
    try {
      val in = new FileInputStream(local)
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
      } finally in.close()
    } finally out.close()
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"Failed to publish delta $target")
    }
  }

  def openDelta(version: Long, ckptId: Option[String] = None): java.io.InputStream =
    fs.open(deltaFile(version, ckptId))

  /** Zip `localDir`'s RocksDB files into `state.snapshot.<version>[_<id>]`.
    * RocksDB info logs (`LOG`, `LOG.old.*`) are excluded — dead weight the
    * reference also stripped before upload (`:438-443`). */
  def upload(localDir: File, version: Long, ckptId: Option[String] = None): Unit = {
    val target = snapshotFile(version, ckptId)
    val tmp = new Path(baseDir, s".state.snapshot.$version.${System.nanoTime()}.tmp")
    val out = new ZipOutputStream(fs.create(tmp, true))
    try {
      val files = Option(localDir.listFiles()).getOrElse(Array.empty[File])
        .filter(f => f.isFile && !f.getName.startsWith("LOG"))
      val buf = new Array[Byte](64 * 1024)
      files.foreach { f =>
        out.putNextEntry(new ZipEntry(f.getName))
        val in = new FileInputStream(f)
        try {
          var n = in.read(buf)
          while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        out.closeEntry()
      }
    } finally out.close()
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"Failed to publish snapshot $target")
    }
  }

  /** Unzip `state.snapshot.<version>[_<id>]` into `destDir` (must exist, empty). */
  def download(version: Long, destDir: File, ckptId: Option[String] = None): Unit = {
    val in = new ZipInputStream(fs.open(snapshotFile(version, ckptId)))
    try {
      val buf = new Array[Byte](64 * 1024)
      var entry: ZipEntry = in.getNextEntry
      while (entry != null) {
        val target = new File(destDir, new File(entry.getName).getName) // no path traversal
        val out = new FileOutputStream(target)
        try {
          var n = in.read(buf)
          while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
        } finally out.close()
        in.closeEntry()
        entry = in.getNextEntry
      }
    } finally in.close()
  }

  /** Delete durable files no longer needed to recover any version >=
    * `maxVersion - retain + 1` (reference `cleanup`, `:573-592`, extended
    * for changelog chains): keep the newest full snapshot at or below the
    * cutoff as the replay base, every delta above it, and everything above
    * the cutoff. Returns the cutoff. */
  def cleanup(retain: Int): Option[Long] = {
    if (!fs.exists(baseDir)) return None
    // list actual paths: v2 names carry an id suffix and cannot be
    // reconstructed from the version number alone
    val listed = fs.listStatus(baseDir).toSeq.map(_.getPath)
    val snaps = listed.flatMap(p => parseVersion(p.getName, "state.snapshot.").map(_ -> p))
    val deltas = listed.flatMap(p => parseVersion(p.getName, "state.delta.").map(_ -> p))
    val all = (snaps ++ deltas).map(_._1)
    if (all.isEmpty) return None
    val cutoff = all.max - math.max(retain, 1) + 1
    val base = snaps.map(_._1).filter(_ <= cutoff).maxOption
    def drop(p: Path): Unit =
      Try(fs.delete(p, false)).failed.foreach { e =>
        logWarning(s"Failed to delete expired state file $p: $e")
      }
    base.foreach { b =>
      snaps.filter(_._1 < b).foreach(e => drop(e._2))
      deltas.filter(_._1 <= b).foreach(e => drop(e._2))
    }
    // reclaim upload temp files orphaned by a crash between create and
    // rename; age-gate so an in-flight commit's tmp is never touched
    val staleBefore = System.currentTimeMillis() - 10 * 60 * 1000L
    Try {
      fs.listStatus(baseDir).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith(".state.") && name.endsWith(".tmp") &&
          st.getModificationTime < staleBefore) drop(st.getPath)
      }
    }
    Some(cutoff)
  }
}

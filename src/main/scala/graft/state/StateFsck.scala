package graft.state

import java.util.zip.{ZipEntry, ZipInputStream}

import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/** Offline checkpoint integrity verifier ("fsck") for state written by
  * [[RocksDbStateStoreProvider]] — the third leg of the state-ops toolset:
  * [[StateRepartition]] migrates a checkpoint, the provider's
  * `SupportsFineGrainedReplay` surface inspects it, `StateFsck` answers the
  * question an operator asks BEFORE trusting either: *can the last
  * committed batch actually be recovered from the durable files, and are
  * those files internally sound?*
  *
  * What a 100 TB deployment loses silently — a changelog deleted by an
  * over-eager retention script, an SST pool file swept by a foreign
  * lifecycle rule, a half-copied checkpoint clone — surfaces today only
  * when the stream restarts and falls back (v1) or dies (v2). Fsck makes
  * it a standing pre-flight/cron check instead of a restart-time surprise.
  *
  * Per (operator, partition, store) it verifies, using only file I/O (no
  * RocksDB instances, no Spark query machinery):
  *
  *  1. **recovery coverage** — the last committed batch's state version is
  *     reconstructible: a full snapshot at the version, or a snapshot base
  *     plus an unbroken changelog chain up to it (v1 by version arithmetic;
  *     v2 by walking each delta's lineage header exactly like the
  *     provider's `materializeV2`);
  *  2. **snapshot soundness** — every retained snapshot zip streams
  *     end-to-end (CRC-checked by the zip reader), and every pool SST an
  *     incremental manifest references exists with the byte length its
  *     content-address name promises;
  *  3. **chain soundness** — every changelog on the recovery chain parses
  *     record-by-record to EOF (truncation/corruption fails the frame
  *     reads), not just its header.
  *
  * The walk is DISTRIBUTED: store directories fan out over the cluster
  * (one task per store, the same unit of parallelism the provider itself
  * uses), so fsck of a 10k-store checkpoint costs one short Spark job, not
  * a driver-side crawl. Zip/pool reads are metadata + streaming reads —
  * no state is materialized anywhere.
  *
  * Exit contract (`main`): nonzero iff any store is uncovered or has
  * integrity errors — wired for cron. `run` returns the per-store report
  * as a DataFrame for programmatic use.
  */
object StateFsck extends Logging {

  /** One store's verification result. `issues` is a human-readable
    * summary of everything counted to its left (empty = clean).
    * `orphanPoolFiles`/`orphanPoolBytes` are INFORMATIONAL (not part of
    * `clean`): pool SSTs referenced by no retained snapshot — either GC
    * debt awaiting the age-gated sweep or bytes a retention script should
    * reclaim; a growing number is the leak signal to alert on. When any
    * retained snapshot zip fails to stream, its reference list is unknown,
    * so orphan counts are suppressed to 0 for the store (the zipError
    * already fails `clean`) instead of reporting phantom orphans. */
  case class StoreReport(
      operatorId: Long,
      partition: Int,
      store: String,
      snapshots: Int,
      deltas: Int,
      requiredVersion: Long,
      covered: Boolean,
      chainLength: Int,
      zipErrors: Int,
      missingPoolRefs: Int,
      badPoolSizes: Int,
      deltaErrors: Int,
      orphanPoolFiles: Int,
      orphanPoolBytes: Long,
      issues: String) {
    def clean: Boolean =
      covered && zipErrors == 0 && missingPoolRefs == 0 && badPoolSizes == 0 && deltaErrors == 0
  }

  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    require(pos.length == 1,
      "usage: StateFsck [--deep] [--parallelism=N] <checkpointDir>")
    val parallelism = flags.collectFirst {
      case f if f.startsWith("--parallelism=") => f.stripPrefix("--parallelism=").toInt
    }.getOrElse(0)
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    val report = run(spark, pos(0), deep = flags.contains("--deep"),
      parallelism = parallelism)
    report.show(1000, truncate = false)
    val bad = report.filter("NOT (covered AND zipErrors = 0 AND missingPoolRefs = 0 " +
      "AND badPoolSizes = 0 AND deltaErrors = 0)").count()
    if (bad > 0) {
      logError(s"fsck: $bad store(s) failed verification")
      sys.exit(1)
    }
  }

  /** Verify every store under `ckptDir` against its last committed batch.
    * Returns one row per (operator, partition, store). `deep = true` also
    * re-hashes every referenced pool SST against its content-address name
    * (md5) — catches same-length bitrot the metadata check cannot; costs
    * one full read of the referenced pool bytes, so it is the
    * weekly-audit mode, not the pre-flight mode. `parallelism` caps the
    * task count; 0 (default) = one task per store, so a 10k-store fsck
    * spreads over the whole cluster. */
  def run(spark: SparkSession, ckptDir: String, deep: Boolean = false,
      parallelism: Int = 0): DataFrame = {
    val hadoopConf = spark.sessionState.newHadoopConf()
    val root = new Path(ckptDir)
    val fs = root.getFileSystem(hadoopConf)

    val commits = listNumeric(fs, new Path(root, "commits"))
    require(commits.nonEmpty, s"no committed batches under $ckptDir/commits — nothing to verify")
    val required = commits.max + 1

    val stores = listStores(fs, new Path(root, "state"))
    require(stores.nonEmpty, s"no state stores under $ckptDir/state")

    val serConf = new SerializableConfiguration(hadoopConf)
    val slices =
      if (parallelism > 0) math.min(parallelism, stores.size) else stores.size
    val reports = spark.sparkContext
      .parallelize(stores, slices)
      .map { case (op, part, name, dir) =>
        verifyStore(serConf.value, new Path(dir), op, part, name, required, deep)
      }
      .collect()
    import spark.implicits._
    reports.toSeq.toDF()
  }

  /** Batch-log style directories: numeric file names are entries. */
  private def listNumeric(fs: FileSystem, dir: Path): Seq[Long] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)

  /** Every directory holding `state.snapshot.*` / `state.delta.*` files:
    * `state/<op>/<part>` itself (single-store operators) and its named
    * subdirectories (join stores), excluding the SST pool and metadata. */
  private[state] def listStores(fs: FileSystem, stateRoot: Path): Seq[(Long, Int, String, String)] = {
    if (!fs.exists(stateRoot)) return Nil
    def hasStateFiles(d: Path): Boolean =
      Try(fs.listStatus(d).exists { st =>
        val n = st.getPath.getName
        n.startsWith("state.snapshot.") || n.startsWith("state.delta.")
      }).getOrElse(false)
    for {
      opSt <- fs.listStatus(stateRoot).toSeq
      if opSt.isDirectory && opSt.getPath.getName.forall(_.isDigit)
      op = opSt.getPath.getName.toLong
      partSt <- fs.listStatus(opSt.getPath).toSeq
      if partSt.isDirectory && partSt.getPath.getName.forall(_.isDigit)
      part = partSt.getPath.getName.toInt
      (name, dir) <- {
        val direct =
          if (hasStateFiles(partSt.getPath)) Seq(("default", partSt.getPath.toString)) else Nil
        val named = fs.listStatus(partSt.getPath).toSeq.filter { st =>
          st.isDirectory && !st.getPath.getName.startsWith("_") &&
            st.getPath.getName != "sst" && hasStateFiles(st.getPath)
        }.map(st => (st.getPath.getName, st.getPath.toString))
        direct ++ named
      }
    } yield (op, part, name, dir)
  }

  /** Verify one store directory (runs on an executor). */
  private def verifyStore(
      hadoopConf: Configuration,
      baseDir: Path,
      op: Long,
      part: Int,
      name: String,
      required: Long,
      deep: Boolean = false): StoreReport = {
    val fs = baseDir.getFileSystem(hadoopConf)
    val mgr = new SnapshotManager(baseDir, hadoopConf)
    val snaps = mgr.listVersions().distinct.sorted
    val deltas = mgr.listDeltaVersions().distinct.sorted
    val issues = scala.collection.mutable.ArrayBuffer.empty[String]

    // v2 checkpoints suffix every durable name with the commit id
    val v2 = (mgr.idsAt(required, snapshot = true) ++
      mgr.idsAt(required, snapshot = false)).nonEmpty &&
      !mgr.snapshotExists(required, None) && !deltaExistsPlain(fs, baseDir, required)

    // ---- 1. recovery coverage + the chain to full-read
    var covered = false
    var chainLength = 0
    var chainDeltas: Seq[(Long, Option[String])] = Nil
    // refs already extracted by the verify pass, keyed by snapshot file
    // name — the orphan step reuses them instead of re-streaming the zips.
    // Snapshot unreadability is tracked as an EXPLICIT flag (not sniffed
    // back out of issue-message wording): any zip that failed to stream
    // makes this store's pool references unknown, which suppresses orphan
    // counting below.
    val refsSeen = scala.collection.mutable.HashMap.empty[String, SnapshotScan]
    var snapshotUnreadable = false
    def scanZip(v: Long, id: Option[String]): SnapshotScan = {
      val scan = verifySnapshotZip(fs, mgr, baseDir, v, id, issues, deep)
      if (!scan.readOk) snapshotUnreadable = true
      scan
    }
    if (v2) {
      val startId = (mgr.idsAt(required, snapshot = true) ++
        mgr.idsAt(required, snapshot = false)).max
      val walk = Try {
        var chain = List.empty[(Long, Option[String])]
        var v = required
        var id = startId
        while (v > 0 && !mgr.snapshotExists(v, Some(id))) {
          chain = (v, Some(id): Option[String]) :: chain
          id = Changelog.readHeaderOnly(mgr.openDelta(v, Some(id)))
          v -= 1
        }
        (v, id, chain)
      }
      walk match {
        case scala.util.Success((baseV, baseId, chain)) =>
          covered = true
          chainLength = chain.size
          chainDeltas = chain
          if (baseV > 0) {
            refsSeen(mgr.snapshotFile(baseV, Some(baseId)).getName) =
              scanZip(baseV, Some(baseId))
          }
        case scala.util.Failure(e) =>
          issues += s"v2 lineage walk from ($required, $startId) broke: ${e.getMessage}"
      }
    } else {
      val deltaSet = deltas.toSet
      val bases = (snaps.filter(_ <= required) :+ 0L).distinct.sorted(Ordering.Long.reverse)
      val base = bases.find(s => s == required || ((s + 1) to required).forall(deltaSet.contains))
      base match {
        case Some(s) =>
          covered = true
          chainLength = (required - s).toInt
          chainDeltas = ((s + 1) to required).map(v => (v, None: Option[String]))
          if (s > 0) {
            refsSeen(mgr.snapshotFile(s, None).getName) = scanZip(s, None)
          }
        case None =>
          issues += s"version $required unrecoverable: snapshots at " +
            s"[${snaps.mkString(",")}], deltas at [${deltas.mkString(",")}]"
      }
    }

    // ---- 2. every OTHER retained snapshot zip streams clean too. v1:
    // version-named zips off the chain; v2: every (version, id) sibling —
    // including non-recovery-path siblings, which would otherwise only
    // surface as misleading orphan counts when corrupt.
    if (v2) {
      snaps.filter(_ != 0).foreach { s =>
        mgr.idsAt(s, snapshot = true).foreach { id =>
          val n = mgr.snapshotFile(s, Some(id)).getName
          if (!refsSeen.contains(n)) {
            refsSeen(n) = scanZip(s, Some(id))
          }
        }
      }
    } else {
      snaps.filter(s => covered && s != 0 && !chainTouches(s, chainDeltas, required))
        .foreach { s =>
          refsSeen(mgr.snapshotFile(s, None).getName) = scanZip(s, None)
        }
    }

    // ---- 3. full-read the recovery chain's changelogs
    var deltaErrors = 0
    chainDeltas.foreach { case (v, id) =>
      Try {
        val in = mgr.openDelta(v, id)
        try {
          if (id.isDefined) Changelog.readHeader(in) // v1 deltas are headerless
          val it = Changelog.read(in)
          while (it.hasNext) it.next()
        } finally Try(in.close())
      }.failed.foreach { e =>
        deltaErrors += 1
        issues += s"changelog $v${id.fold("")("_" + _)} unreadable: ${e.getMessage}"
      }
    }

    // ---- 4. orphan accounting: pool SSTs no retained snapshot references
    val poolDir = new Path(baseDir, "sst")
    val poolFiles = Try(fs.listStatus(poolDir).toSeq
      .filter(_.getPath.getName.endsWith(".sst"))).getOrElse(Nil)
    val (orphanN, orphanB) =
      if (poolFiles.isEmpty) (0, 0L)
      else {
        // a zip that cannot stream has UNKNOWN references: record the issue
        // (it fails `clean` as a zipError) and suppress orphan counts for
        // the whole store rather than report its pool files as orphans
        var refsUnknown = false
        val referenced = Try(fs.listStatus(baseDir).toSeq
          .map(_.getPath.getName).filter(_.startsWith("state.snapshot.")))
          .getOrElse(Nil)
          .flatMap { n =>
            refsSeen.get(n).map(_.refs).getOrElse {
              Try(refsOfZip(fs, new Path(baseDir, n))).recoverWith { case e =>
                refsUnknown = true
                issues += s"snapshot $n unreadable during orphan accounting: ${e.getMessage}"
                scala.util.Failure(e)
              }.getOrElse(Nil)
            }
          }
          .toSet
        // only SNAPSHOT unreadability makes references unknown — a broken
        // changelog ("changelog N unreadable") leaves the zip manifests
        // fully readable and must not zero the leak signal. Both unknown
        // sources are explicit booleans (scanZip's readOk, this block's
        // refsUnknown), never re-derived from issue-message wording.
        if (refsUnknown || snapshotUnreadable) (0, 0L)
        else {
          val orphans = poolFiles.filterNot(f => referenced(f.getPath.getName))
          (orphans.size, orphans.map(_.getLen).sum)
        }
      }

    val zipErrors = issues.count(_.startsWith("snapshot "))
    val missingRefs = issues.count(_.startsWith("pool ref missing"))
    val badSizes = issues.count(i =>
      i.startsWith("pool ref size") || i.startsWith("pool ref corrupt"))
    StoreReport(op, part, name, snaps.size, deltas.size, required,
      covered, chainLength, zipErrors, missingRefs, badSizes, deltaErrors,
      orphanN, orphanB, issues.mkString("; "))
  }

  /** Just the incremental manifest's remote names from one snapshot zip
    * (empty for full zips); stops at the manifest entry. */
  private[state] def refsOfZip(fs: FileSystem, file: Path): Seq[String] = {
    val in = new ZipInputStream(fs.open(file))
    try {
      val buf = new Array[Byte](64 * 1024)
      var entry: ZipEntry = in.getNextEntry
      while (entry != null) {
        if (entry.getName == SnapshotManager.SstRefsEntry) {
          val bos = new java.io.ByteArrayOutputStream()
          var n = in.read(buf)
          while (n >= 0) { if (n > 0) bos.write(buf, 0, n); n = in.read(buf) }
          return new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
            .split("\n").toSeq.filter(_.nonEmpty).map(_.split("\t", 2)(1))
        }
        in.closeEntry()
        entry = in.getNextEntry
      }
      Nil
    } finally in.close()
  }

  private def deltaExistsPlain(fs: FileSystem, baseDir: Path, v: Long): Boolean =
    Try(fs.exists(new Path(baseDir, s"state.delta.$v"))).getOrElse(false)

  /** Is `s` the base the verified chain already covers? (The base zip was
    * verified in the coverage step; avoid double work.) */
  private def chainTouches(s: Long, chain: Seq[(Long, Option[String])], required: Long): Boolean =
    chain.headOption.map(_._1 - 1).getOrElse(required) == s

  /** A verified snapshot zip's extracted pool references plus an explicit
    * read-success flag — `readOk = false` means the zip failed to stream,
    * so `refs` may be partial and the store's pool references are unknown. */
  private[state] case class SnapshotScan(refs: Seq[String], readOk: Boolean)

  /** Stream a snapshot zip end-to-end (the zip reader CRC-checks every
    * entry on read) and verify each incremental manifest reference exists
    * in the pool with the length its `<md5>-<len>.sst` name promises. */
  private def verifySnapshotZip(
      fs: FileSystem,
      mgr: SnapshotManager,
      baseDir: Path,
      version: Long,
      ckptId: Option[String],
      issues: scala.collection.mutable.ArrayBuffer[String],
      deep: Boolean = false): SnapshotScan = {
    val file = mgr.snapshotFile(version, ckptId)
    val refs = scala.collection.mutable.ArrayBuffer.empty[String]
    val read = Try {
      val in = new ZipInputStream(fs.open(file))
      try {
        val buf = new Array[Byte](64 * 1024)
        var entry: ZipEntry = in.getNextEntry
        while (entry != null) {
          if (entry.getName == SnapshotManager.SstRefsEntry) {
            val bos = new java.io.ByteArrayOutputStream()
            var n = in.read(buf)
            while (n >= 0) { if (n > 0) bos.write(buf, 0, n); n = in.read(buf) }
            refs ++= new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
              .split("\n").toSeq.filter(_.nonEmpty).map(_.split("\t", 2)(1))
          } else {
            var n = in.read(buf)
            while (n >= 0) n = in.read(buf) // drain: CRC validated at entry end
          }
          in.closeEntry()
          entry = in.getNextEntry
        }
      } finally in.close()
    }
    read.failed.foreach(e => issues += s"snapshot ${file.getName} unreadable: ${e.getMessage}")
    refs.foreach { remote =>
      val p = new Path(new Path(baseDir, "sst"), remote)
      Try(fs.getFileStatus(p)).toOption match {
        case None => issues += s"pool ref missing: $remote (snapshot ${file.getName})"
        case Some(st) =>
          // content-address name: <md5>-<len>.sst
          val expected = Try(remote.stripSuffix(".sst").split("-").last.toLong).toOption
          if (expected.exists(_ != st.getLen)) {
            issues += s"pool ref size mismatch: $remote is ${st.getLen} B, " +
              s"name promises ${expected.get} B"
          } else if (deep) {
            val wantMd5 = remote.stripSuffix(".sst").split("-").dropRight(1).mkString("-")
            val md = java.security.MessageDigest.getInstance("MD5")
            val read = Try {
              val in = fs.open(p)
              try {
                val buf = new Array[Byte](64 * 1024)
                var n = in.read(buf)
                while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
              } finally in.close()
            }
            read.failed.foreach(e =>
              issues += s"pool ref corrupt: $remote unreadable: ${e.getMessage}")
            if (read.isSuccess) {
              val got = md.digest().map("%02x".format(_)).mkString
              if (got != wantMd5) {
                issues += s"pool ref corrupt: $remote content md5 $got, name promises $wantMd5"
              }
            }
          }
      }
    }
    SnapshotScan(refs.toSeq, read.isSuccess)
  }
}

package graft.operators

import scala.util.{Failure, Success, Try}

import org.apache.hadoop.fs.Path
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offline integrity verifier ("fsck") for the DURABLE INDEX ARTIFACTS
  * under `spark.graft.index.root` — the [[graft.state.StateFsck]]
  * discipline applied to the engine's other persisted-state family. The
  * checkpoint side has fsck/gc/guard; the index root holds the artifacts a
  * 100 TB deployment actually serves from (IVF×PQ layouts and their
  * shard/merged variants, LSH signature tables, BPE merge tables,
  * [[Similarity.publishLayout]] atomic-publish discipline), and a crashed
  * publish, a half-deleted table, or a foreign retention sweep surfaces
  * today only as a wrong answer or a failed query. Fsck makes it a
  * standing pre-flight/cron check.
  *
  * Per layout directory under the root it verifies:
  *
  *  1. **publish completeness** — the layout's done-marker (the
  *     last-written table's `_SUCCESS`) is present; a marker-less
  *     non-empty layout is a crashed publish ([[Similarity.publishLayout]]
  *     refuses to serve or rebuild over it, so it needs operator action);
  *  2. **table soundness** — every required table reads end-to-end
  *     (missing directory vs unreadable parquet reported separately);
  *  3. **cross-table key consistency** (the check only the artifact owner
  *     can run) — for IVF×PQ layouts: `cells` and `codes` agree on the
  *     vector-id set, every vector carries exactly the codebook's
  *     subspace count of code rows, every filed cell resolves in
  *     `centroids`, and every `(m, cid)` code resolves in `codebook`
  *     (quantizer tables absent by design in shard layouts, which file
  *     against a shared quantizer); for LSH signature tables: `doc_id`
  *     unique, no null signature/shingle sets; for BPE merges: `round`
  *     unique and non-empty.
  *
  * Orphan `.tmp-*` build directories (a crashed or in-flight
  * [[Similarity.publishLayout]]) are reported INFORMATIONALLY with their
  * byte size, mirroring StateFsck's orphan-pool-bytes posture: junk to
  * sweep, not an integrity failure of any published layout.
  *
  * Everything runs as small distributed Spark jobs over the layout tables
  * themselves (anti-joins and aggregates on id/code columns — the
  * 50×-compressed representation, never raw embeddings or text), so fsck
  * of a multi-TB index root is one short job per layout, not a driver
  * crawl.
  *
  * Exit contract (`main`): nonzero iff any layout is incomplete,
  * unreadable, inconsistent, or unrecognized — wired for cron. `run`
  * returns the per-layout report as a DataFrame for programmatic use.
  */
object IndexFsck extends Logging {

  /** One layout's verification result. `clean` excludes the informational
    * `build-tmp` rows (orphan bytes are a sweep signal, not damage). */
  case class LayoutReport(
      layout: String,
      family: String,
      complete: Boolean,
      tablesOk: Int,
      missingTables: Int,
      unreadableTables: Int,
      keyMismatches: Long,
      arityErrors: Long,
      danglingRefs: Long,
      orphanBytes: Long,
      issues: String) {
    def clean: Boolean = family == "build-tmp" ||
      (family != "unknown" && complete && missingTables == 0 &&
        unreadableTables == 0 && keyMismatches == 0 && arityErrors == 0 &&
        danglingRefs == 0)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: IndexFsck <indexRoot>")
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    val report = run(spark, args(0))
    report.show(1000, truncate = false)
    // the ONE clean definition (LayoutReport.clean) drives the exit code —
    // a re-spelled Column predicate here would silently drift from it
    val lrEnc = org.apache.spark.sql.Encoders.product[LayoutReport]
    val bad = report.as(lrEnc).collect().count(!_.clean)
    if (bad > 0) {
      logError(s"index fsck: $bad layout(s) failed verification")
      sys.exit(1)
    }
  }

  def run(spark: SparkSession, indexRoot: String): DataFrame = {
    import spark.implicits._
    val root = new Path(indexRoot)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(root), s"index root $indexRoot does not exist")
    val entries = fs.listStatus(root).filter(_.isDirectory).toSeq
    val reports = entries.map { st =>
      val name = st.getPath.getName
      if (IndexGc.StagingSuffix.matcher(name).find()) {
        val bytes = Try(fs.getContentSummary(st.getPath).getLength).getOrElse(0L)
        LayoutReport(name, "build-tmp", complete = false, 0, 0, 0, 0, 0, 0, bytes,
          s"orphan publish staging dir ($bytes bytes) — crashed or in-flight " +
            "build; sweep if stale")
      } else Try(verifyLayout(spark, fs, st.getPath)) match {
        // damage tolerance: one layout whose table parses as parquet but
        // carries a foreign schema (an AnalysisException out of a column
        // reference) must cost ITS report row, never the whole root's run
        case Success(lr) => lr
        case Failure(e) =>
          LayoutReport(name, "verify-error", complete = false, 0, 0, 1, 0, 0, 0, 0,
            s"verification crashed: ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    reports.toDF()
  }

  /** Family recognition is by TABLE PRESENCE, not directory name: the
    * tables are the contract, names are convention. */
  private def verifyLayout(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      p: Path): LayoutReport = {
    def has(t: String): Boolean = fs.exists(new Path(p, t))
    val name = p.getName
    // EITHER quantizer table marks a full layout: a full layout whose
    // centroids were deleted must report that missing table, not pass as
    // a healthy shard (a true shard has only cells+codes; one with BOTH
    // quantizer tables gone is indistinguishable and reports as a shard)
    if (has("codes") && (has("centroids") || has("codebook")))
      ivfpqReport(spark, fs, p, "ivfpq",
        Seq("centroids", "cells", "codebook", "codes"))
    else if (has("codes"))
      ivfpqReport(spark, fs, p, "ivfpq-shard", Seq("cells", "codes"))
    else if (has("sigs")) lshReport(spark, fs, p)
    else if (has("fps")) fpReport(spark, fs, p)
    else if (has("merges")) bpeReport(spark, fs, p)
    else LayoutReport(name, "unknown", complete = false, 0, 0, 0, 0, 0, 0, 0,
      "unrecognized layout: no known table directory (centroids/cells/" +
        "codebook/codes, sigs, fps, merges) — a foreign directory in the index root")
  }

  /** (readable tables by name, missing count, unreadable count, issues). */
  private def readTables(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      p: Path, required: Seq[String]): (Map[String, DataFrame], Int, Int, Seq[String]) = {
    var missing = 0
    var unreadable = 0
    val issues = Seq.newBuilder[String]
    val ok = Map.newBuilder[String, DataFrame]
    required.foreach { t =>
      val tp = new Path(p, t)
      if (!fs.exists(tp)) {
        missing += 1
        issues += s"table $t missing"
      } else Try {
        val df = spark.read.parquet(tp.toString)
        df.count() // end-to-end read: footers AND pages must parse
        df
      } match {
        case Success(df) => ok += t -> df
        case Failure(e) =>
          unreadable += 1
          issues += s"table $t unreadable: ${e.getClass.getSimpleName}"
      }
    }
    (ok.result(), missing, unreadable, issues.result())
  }

  private def ivfpqReport(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      p: Path, family: String, required: Seq[String]): LayoutReport = {
    val complete = fs.exists(new Path(p, "codes/_SUCCESS"))
    val (tables, missing, unreadable, tblIssues) = readTables(spark, fs, p, required)
    val issues = Seq.newBuilder[String]
    issues ++= tblIssues
    if (!complete) issues += "publish marker codes/_SUCCESS absent (crashed publish?)"
    var keyMismatches = 0L
    var arityErrors = 0L
    var dangling = 0L
    if (tables.contains("cells") && tables.contains("codes")) {
      val cellIds = tables("cells").select(col("vec_id")).distinct()
      val codeIds = tables("codes").select(col("vec_id")).distinct()
      keyMismatches = cellIds.join(codeIds, Seq("vec_id"), "full_outer")
        .count() - cellIds.intersect(codeIds).count()
      // every vector carries one code row per codebook subspace; derive the
      // subspace count from the layout itself (self-describing, and shard
      // layouts validate against the shared quantizer's own codes shape)
      val arityDf = tables("codes").groupBy(col("vec_id"))
        .agg(countDistinct(col("m")).as("nm"), count(lit(1)).as("nr"))
      tables.get("codebook") match {
        // the codebook states the expected subspace count — vectors are
        // checked against IT, so a UNIFORM truncation (every vector lost
        // the same subspaces) is caught, which a cross-vector comparison
        // alone cannot see
        case Some(cb) =>
          val m = cb.select(countDistinct(col("m"))).collect()(0).getLong(0)
          val short = arityDf.filter(col("nm") =!= m).count()
          if (short > 0) {
            arityErrors += short
            issues += s"$short vectors with subspace count != codebook's $m"
          }
        // shard layouts carry no codebook: fall back to cross-vector
        // agreement (uniform truncation is then caught at merge/serve,
        // where the shared quantizer's shape applies)
        case None =>
          val arities = arityDf.select(col("nm")).distinct().collect().map(_.getLong(0))
          if (arities.length > 1) {
            arityErrors += arityDf.groupBy(col("nm")).count()
              .orderBy(col("count").asc).limit(1).collect()(0).getLong(1)
            issues += s"codes arity split: subspace counts ${arities.sorted.mkString("/")}"
          }
      }
      arityErrors += arityDf.filter(col("nr") =!= col("nm")).count() // dup (vec,m)
      if (keyMismatches > 0)
        issues += s"$keyMismatches vec_ids in exactly one of cells/codes"
    }
    if (tables.contains("cells") && tables.contains("centroids")) {
      dangling += tables("cells").select(col("cell"))
        .join(tables("centroids").select(col("ccid").as("cell")), Seq("cell"), "left_anti")
        .count()
    }
    if (tables.contains("codes") && tables.contains("codebook")) {
      dangling += tables("codes").select(col("m"), col("cid"))
        .join(tables("codebook").select(col("m"), col("cid")), Seq("m", "cid"), "left_anti")
        .count()
    }
    if (dangling > 0) issues += s"$dangling index rows reference no quantizer row"
    LayoutReport(p.getName, family, complete, tables.size, missing, unreadable,
      keyMismatches, arityErrors, dangling, 0L, issues.result().mkString("; "))
  }

  private def lshReport(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      p: Path): LayoutReport = {
    val complete = fs.exists(new Path(p, "sigs/_SUCCESS"))
    val (tables, missing, unreadable, tblIssues) = readTables(spark, fs, p, Seq("sigs"))
    val issues = Seq.newBuilder[String]
    issues ++= tblIssues
    if (!complete) issues += "publish marker sigs/_SUCCESS absent (crashed publish?)"
    var keyMismatches = 0L
    var arityErrors = 0L
    tables.get("sigs").foreach { sigs =>
      keyMismatches = sigs.count() - sigs.select(col("doc_id")).distinct().count()
      if (keyMismatches > 0) issues += s"$keyMismatches duplicate doc_id rows"
      arityErrors = sigs.filter(col("sig").isNull || col("sh").isNull).count()
      if (arityErrors > 0) issues += s"$arityErrors rows with null signature/shingle set"
      // a pre-hash-compaction layout stores sh as strings: the serve path
      // refuses it with a typed error (Dedup.readSigsTable) — fsck must
      // flag it too, not pass the stale format as clean
      sigs.schema.fields.find(_.name == "sh").map(_.dataType) match {
        case Some(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, _)) => ()
        case other =>
          arityErrors += 1
          issues += s"sh stored as ${other.map(_.simpleString).getOrElse("<absent>")}" +
            " — stale pre-hash-compaction format; delete the layout and rebuild"
      }
    }
    LayoutReport(p.getName, "lsh-sigs", complete, tables.size, missing, unreadable,
      keyMismatches, arityErrors, 0L, 0L, issues.result().mkString("; "))
  }

  private def fpReport(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      p: Path): LayoutReport = {
    val complete = fs.exists(new Path(p, "fps/_SUCCESS"))
    val (tables, missing, unreadable, tblIssues) = readTables(spark, fs, p, Seq("fps"))
    val issues = Seq.newBuilder[String]
    issues ++= tblIssues
    if (!complete) issues += "publish marker fps/_SUCCESS absent (crashed publish?)"
    var keyMismatches = 0L
    var arityErrors = 0L
    tables.get("fps").foreach { fps =>
      keyMismatches = fps.count() - fps.select(col("fp")).distinct().count()
      if (keyMismatches > 0) issues += s"$keyMismatches duplicate fingerprint rows"
      arityErrors = fps.filter(col("fp").isNull || col("corpus_rep").isNull).count()
      if (arityErrors > 0) issues += s"$arityErrors rows with null fp/representative"
    }
    LayoutReport(p.getName, "fp-reps", complete, tables.size, missing, unreadable,
      keyMismatches, arityErrors, 0L, 0L, issues.result().mkString("; "))
  }

  private def bpeReport(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      p: Path): LayoutReport = {
    val complete = fs.exists(new Path(p, "merges/_SUCCESS"))
    val (tables, missing, unreadable, tblIssues) = readTables(spark, fs, p, Seq("merges"))
    val issues = Seq.newBuilder[String]
    issues ++= tblIssues
    if (!complete) issues += "publish marker merges/_SUCCESS absent (crashed publish?)"
    var keyMismatches = 0L
    tables.get("merges").foreach { m =>
      keyMismatches = m.count() - m.select(col("round")).distinct().count()
      if (keyMismatches > 0) issues += s"$keyMismatches duplicate merge rounds"
    }
    LayoutReport(p.getName, "bpe-merges", complete, tables.size, missing, unreadable,
      keyMismatches, 0L, 0L, 0L, issues.result().mkString("; "))
  }
}

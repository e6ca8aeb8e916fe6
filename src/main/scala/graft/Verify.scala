package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failure containment (round-7 postmortem): `oracle_sql.json` is written
  * BEFORE the query loop — it depends on nothing the loop computes — and
  * every query runs under a [[BoundedRun]] wall-clock guard, so one wedged
  * or crashing query costs exactly its own FAIL row, never the round's
  * whole correctness artifact.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — names beyond the first two
    // restrict the run (dev shortcut; the driver always passes exactly two)
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val perQuerySecs = sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT_SECS", "300").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      BoundedRun.attempt(spark, name, perQuerySecs) {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } match {
        case Right(_) => ()
        case Left(err) =>
          // A failed query must leave a trace the driver can surface as an
          // `err` row — a silently absent entry cost round 8 a from-scratch
          // diagnosis of 26 missing queries.
          scala.util.Try(Files.writeString(Paths.get(s"$outDir/$name.err"), err))
      }
    }
    spark.stop()
    // Abandoned daemon threads wedged in native code would otherwise keep
    // non-daemon Spark machinery alive past stop(); exit explicitly.
    sys.exit(0)
  }
}

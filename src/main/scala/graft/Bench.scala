package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are forced through the `noop` sink so every
  * output column is fully computed — a bare `.count()` would let Catalyst
  * prune projections and undercount the real work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Queries run in sorted-name order so per-query numbers are comparable
    // across rounds (`queries` is a hash Map — iteration order shifts as
    // entries are added, and whichever query ran first absorbed session
    // warmup). Warmup is paid up front by one discarded query per cost
    // family — lineitem scan+agg codegen, documents scan + shingle kernel,
    // and the streaming one-off (events staging + micro-batch machinery) —
    // so measured times are steady-state rather than charging family warmup
    // to whichever member sorts first.
    // stream_limit stages the unsorted events dir; stream_watermark stages
    // the ts-ordered dir (both one-offs shared by their whole family)
    Seq("q1_pricing_summary", "dedup_ngram_jaccard", "stream_limit",
        "stream_watermark").foreach { w =>
      val warm0 = System.nanoTime()
      try SparkEntry.queries(w)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] warmup $w failed: ${e.getMessage}") }
      System.err.println(f"[bench] warmup $w (discarded): ${(System.nanoTime() - warm0) / 1e9}%.2f s")
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // -1 marks a failed query; a crash-until-elapsed time would read as a
      // (fast) success in the JSON
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // The stdout line is the driver's capture, but captured stdout can be
    // truncated (BENCH_r05.json lost its tail mid-line); the file is the
    // complete, archivable artifact.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    spark.stop()
  }
}

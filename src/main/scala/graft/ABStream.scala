package graft

import org.apache.spark.sql.SparkSession

/** A/B harness for the streaming-gate drift question (VERDICT r11 item 4):
  * run a fixed list of stream_* queries once per pass, N passes, in ONE
  * JVM, printing per-pass seconds as JSON lines. The same file is compiled
  * into both the round-7 tree (f6cacee) and HEAD so the two binaries are
  * driven identically inside one host window.
  */
object ABStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def runOne(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // staging warmup (discarded): pay the per-JVM events staging one-offs
    Seq("stream_limit", "stream_watermark").foreach { w =>
      try runOne(w) catch { case e: Throwable => System.err.println(s"[ab] warmup $w failed: $e") }
    }
    (1 to passes).foreach { p =>
      val times = names.map { n =>
        val t = try runOne(n) catch { case e: Throwable => System.err.println(s"[ab] $n: $e"); -1.0 }
        "\"" + n + "\":" + f"$t%.3f"
      }
      println(s"""ABJSON{"pass":$p,"queries":{${times.mkString(",")}}}""")
    }
    spark.stop()
    sys.exit(0)
  }
}

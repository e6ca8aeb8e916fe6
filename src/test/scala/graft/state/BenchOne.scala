package graft
import org.apache.spark.sql.SparkSession

/** Dev scratch main (NOT a test): noop-sink bench for a SUBSET of gate
  * queries, in the given order, in one JVM — for isolating a single query's
  * steady-state time or reproducing cross-query interference (e.g. the
  * loaded-provider accumulation the 1 s maintenance tick in
  * `StreamingQueries.runStream` exists to prevent) without the full
  * `graft.Bench` sweep.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... Test/runMain graft.BenchOne <name>...
  * (prefix with a warmup query from the same cost family — e.g.
  * `stream_watermark` pays the ordered-staging one-off for all stream_*
  * entries that follow.)
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config(Tables.nanosConf._1, Tables.nanosConf._2).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      System.err.println(f"[benchone] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

package graft.state

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Dev scratch main (NOT a test): run a two-operator stateful query (dedup →
  * agg) with the graft provider, then dump the checkpoint tree + the offsets
  * and operator-metadata payloads — the ground truth the offline
  * [[StateRepartition]] tool must rewrite.
  */
object RepartitionProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.stateStore.providerClass",
        classOf[RocksDbStateStoreProvider].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt = Files.createTempDirectory("graft-repart-probe-").toString
    val input = MemoryStream[(String, Int)]
    val df = input.toDF().toDF("k", "v")
      .dropDuplicates("k", "v")
      .groupBy($"k").agg(sum($"v").as("total"))
    val q = df.writeStream.format("memory").queryName("probe")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData(("a", 1), ("b", 2), ("c", 3))
      q.processAllAvailable()
      input.addData(("a", 1), ("a", 4), ("d", 5))
      q.processAllAvailable()
    } finally q.stop()

    println(s"CKPT=$ckpt")
    def walk(p: Path, indent: String): Unit = {
      val entries = Files.list(p).iterator()
      while (entries.hasNext) {
        val e = entries.next()
        val sz = if (Files.isRegularFile(e)) s" (${Files.size(e)} B)" else ""
        println(indent + e.getFileName + sz)
        if (Files.isDirectory(e)) walk(e, indent + "  ")
      }
    }
    walk(Paths.get(ckpt), "")

    println("---- offsets/1 ----")
    println(new String(Files.readAllBytes(Paths.get(ckpt, "offsets", "1")), "UTF-8"))
    println("---- commits ----")
    Files.list(Paths.get(ckpt, "commits")).iterator().forEachRemaining(f =>
      println(f.getFileName + ": " + new String(Files.readAllBytes(f), "UTF-8")))
    for (op <- Seq("0", "1")) {
      val md = Paths.get(ckpt, "state", op, "_metadata", "metadata")
      if (Files.exists(md)) {
        println(s"---- state/$op/_metadata/metadata ----")
        println(new String(Files.readAllBytes(md), "UTF-8"))
      }
      Files.walk(Paths.get(ckpt, "state", op)).iterator().forEachRemaining { f =>
        val n = f.toString
        if (n.contains("Schema") || n.contains("schema"))
          println(s"schema file: $f  size=${if (Files.isRegularFile(f)) Files.size(f) else -1}")
      }
    }

    // What does the statestore source give us back?
    val st = spark.read.format("statestore")
      .option("batchId", "1").option("operatorId", "1").load(ckpt)
    st.printSchema()
    st.show(false)
    spark.stop()
  }
}

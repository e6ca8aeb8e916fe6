package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sanity fixture synthesizer (round 17, VERDICT r16 item 7): the
  * driver fixtures stop at sf0.1 and are read-only, so this stages a
  * deterministic REPLICATED corpus at `outDir` — every fact table unioned
  * `Rep` times with key shifts (ids stay unique; id-derived slices like
  * `doc_id % 20` stay balanced because shifts are multiples of 140), and
  * dimension tables copied as-is. Content is duplicated by construction
  * (each text/embedding appears Rep times under distinct ids), which is a
  * fair dedup-shaped corpus: the pair/cluster operators see Rep-way
  * duplicate groups. Used ONLY for wall-clock scale sanity (the bench main
  * pointed at the synthesized dir); correctness at scale stays the job of
  * the two-SF close gate.
  */
object ScaleSynthMain {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-sfbig"
    val rep = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config(graft.Tables.nanosConf._1, graft.Tables.nanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def reps(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until rep).map(i => shift(df, i)).reduce(_ unionByName _)

    // shifts: multiples of 140e6 (divisible by 20 and 7 — keeps the
    // doc_id % 20 eval slice and % 7 takedown slice balanced per replica)
    val S = 140000000L
    def write(name: String, df: DataFrame): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[synth] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }

    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(t, spark.read.parquet(s"$srcDir/$t.parquet"))
    }
    write("documents", reps(spark.read.parquet(s"$srcDir/documents.parquet")) {
      (df, i) => df.withColumn("doc_id", col("doc_id") + lit(i * S))
    })
    write("embeddings", reps(spark.read.parquet(s"$srcDir/embeddings.parquet")) {
      (df, i) => df.withColumn("vec_id", col("vec_id") + lit(i * S))
    })
    write("events", reps(spark.read.parquet(s"$srcDir/events.parquet")) {
      (df, i) => df.withColumn("event_id", col("event_id") + lit(i * S))
        .withColumn("user_id", col("user_id") + lit(i * S))
    })
    write("orders", reps(spark.read.parquet(s"$srcDir/orders.parquet")) {
      (df, i) => df.withColumn("o_orderkey", col("o_orderkey") + lit(i * S))
    })
    write("lineitem", reps(spark.read.parquet(s"$srcDir/lineitem.parquet")) {
      (df, i) => df.withColumn("l_orderkey", col("l_orderkey") + lit(i * S))
    })
    spark.stop(); sys.exit(0)
  }
}

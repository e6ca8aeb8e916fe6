package graft.state

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition probe for sim_knn_graph (round 17): time the
  * stage family separately and print candidate volumes, so the optimization
  * targets the measured stage instead of a guess. Not part of the bench. */
object KnnProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config(graft.Tables.nanosConf._1, graft.Tables.nanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Lsh, Similarity}
    val e0 = graft.Tables.embeddings(spark, dir)
    println(s"[knn] embeddings count = ${e0.count()}, dim = ${graft.Tables.embeddingsDim(spark, dir)}")
    val nb = Lsh.numBits(graft.Tables.embeddingsCount(spark, dir), Lsh.maxBits(spark))
    println(s"[knn] nb = $nb")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[knn] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = e0.select(col("vec_id"), col("embedding"),
      Lsh.bucketCol(nb, col("embedding")).as("blk"))
    (1 to 2).foreach { i =>
      t(s"bucket+count pass $i") { e.write.format("noop").mode("overwrite").save() }
    }
    val q = e.repartition(col("vec_id"))
      .select(col("vec_id").as("src"), explode(expr(Lsh.probesSpark(nb))).as("blk"))
    (1 to 2).foreach { i =>
      t(s"probe explode pass $i") { q.write.format("noop").mode("overwrite").save() }
    }
    val joined = e.join(q, Seq("blk")).filter(col("vec_id") =!= col("src"))
    (1 to 2).foreach { i =>
      t(s"join pass $i (no dot, no window)") { joined.write.format("noop").mode("overwrite").save() }
    }
    println(s"[knn] candidate rows = ${joined.count()}")
    (1 to 2).foreach { i =>
      t(s"full query pass $i") {
        Similarity.queries("sim_knn_graph")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop(); sys.exit(0)
  }
}

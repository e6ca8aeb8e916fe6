package graft.state

/** Scratch stage-profiling for dedup_ngram_jaccard (mirrors Dedup.scala's
  * current implementation; not a test). */
object Profile2Main {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"PROF $label: ${(System.nanoTime() - t0) / 1e9}"); r
    }

    val toksS = "split(trim(text), '\\\\s+')"
    val shinglesS =
      s"CASE WHEN size($toksS) < 3 THEN array(trim(text)) " +
      s"ELSE array_distinct(transform(sequence(1, size($toksS) - 2), " +
      s"i -> concat_ws(' ', slice($toksS, i, 3)))) END"

    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), expr(shinglesS).as("sh"))
    time("shingles")(docs.write.format("noop").mode("overwrite").save())

    val sizes = docs.select(col("doc_id"), size(col("sh")).as("n"))
    val postings = docs.select(col("doc_id"), explode(col("sh")).as("s"))
      .repartition(col("s"))
    time("postings")(postings.write.format("noop").mode("overwrite").save())
    println("postings rows: " + time("postings-count")(postings.count()))

    val keep = postings.groupBy(col("s"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= 1000)
      .select(col("s"))
    val capped = postings.join(keep, "s").select(col("doc_id"), col("s"))
    time("capped")(capped.write.format("noop").mode("overwrite").save())

    val p2 = capped.select(col("doc_id").as("doc_id_b"), col("s"))
    val common = capped.join(p2,
        capped("s") === p2("s") && capped("doc_id") < p2("doc_id_b"))
      .groupBy(capped("doc_id").as("doc_id_a"), p2("doc_id_b"))
      .agg(count(lit(1)).as("common"))
    time("pairs")(common.write.format("noop").mode("overwrite").save())
    println("pair rows: " + time("pairs-count")(common.count()))

    val out = common
      .join(sizes.toDF("doc_id_a", "na"), "doc_id_a")
      .join(sizes.toDF("doc_id_b", "nb"), "doc_id_b")
      .filter(col("common") * 10 >= (col("na") + col("nb") - col("common")) * 6)
    time("final")(out.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

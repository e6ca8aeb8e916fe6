package graft.state

/** Scratch stage-profiling for dedup_minhash_lsh (mirrors Dedup.scala's
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
    val rnd = new scala.util.Random(42)
    val as = Array.fill(32)(rnd.nextInt(1 << 28).toLong * 2 + 1)
    val bs = Array.fill(32)(rnd.nextInt(1 << 28).toLong)
    val aArr = as.mkString("array(", "L,", "L)")
    val bArr = bs.mkString("array(", "L,", "L)")
    val sig =
      s"""transform(sequence(0, 31), j ->
         |  array_min(transform(hs, h ->
         |    (element_at($aArr, j + 1) * h + element_at($bArr, j + 1)) % 2147483647)))""".stripMargin
    val bandKeys =
      s"""transform(sequence(0, 15), b ->
         |  concat(CAST(element_at(sig, 2*b+1) AS STRING), ',', CAST(element_at(sig, 2*b+2) AS STRING)))""".stripMargin

    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), expr(shinglesS).as("sh"))
    val withSig = docs
      .withColumn("hs", expr(
        "transform(sh, s -> CAST(conv(substring(md5(s), 1, 7), 16, 10) AS BIGINT))"))
      .withColumn("sig", expr(sig))
      .select(col("doc_id"), col("sig"))
      .repartition(col("doc_id"))
    val bands = withSig.select(col("doc_id"), posexplode(expr(bandKeys))).toDF("doc_id", "band", "bkey")
    time("bands")(bands.write.format("noop").mode("overwrite").save())

    val b2 = bands.toDF("doc_id_b", "band", "bkey")
    val cand = bands.join(b2, Seq("band", "bkey"))
      .filter(col("doc_id") < col("doc_id_b"))
      .select(col("doc_id").as("doc_id_a"), col("doc_id_b")).distinct()
    time("cand")(cand.write.format("noop").mode("overwrite").save())

    val shA = docs.select(col("doc_id").as("doc_id_a"), col("sh").as("sh_a"))
    val shB = docs.select(col("doc_id").as("doc_id_b"), col("sh").as("sh_b"))
    val j1 = time("join-only")(cand.join(shA, "doc_id_a").join(shB, "doc_id_b"))
    time("joined-noop")(j1.write.format("noop").mode("overwrite").save())
    val verified = j1
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("union_size", size(col("sh_a")) + size(col("sh_b")) - col("common"))
      .filter(col("common") * 10 >= col("union_size") * 6)
    time("verify")(verified.write.format("noop").mode("overwrite").save())
    println(verified.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata, processed by partition-parallel decode
  * pipelines.
  *
  * The fixtures carry no real media, so the payload is the UTF-8 encoding of
  * `text` — the POINT here is the Spark-side plumbing: binary columns flow
  * through parquet scan → typed Dataset → `mapPartitions` batch decode →
  * DataFrame, exactly the shape a real image/audio decoder plugs into. The
  * decode step itself is a clearly-marked deterministic STUB (the container
  * has no image/audio libs — see the builder brief).
  *
  * Scale: `mapPartitions` keeps the decoder per-partition (one decoder
  * instance per task, amortized over the batch), no shuffle is introduced,
  * and the binary column is never collected to the driver.
  */
object Multimodal {

  /** SQL-expressible metadata extraction over the binary payload. */
  def mm_metadata(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"), col("text"))
      .select(
        col("doc_id"),
        length(col("blob")).as("n_bytes"),
        lower(hex(substring(col("blob"), 1, 8))).as("header_hex"),
        ((length(col("blob")) + 1023).cast("long").divide(1024)).cast("long").as("n_chunks"),
        ascii(substring(col("text"), 1, 1)).as("first_byte"))
  }

  val mm_metadata_sql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS INT) AS n_bytes,
      |  lower(hex(encode(substr(text, 1, 8)))) AS header_hex,
      |  CAST((length(text) + 1023) // 1024 AS BIGINT) AS n_chunks,
      |  CAST(ord(substr(text, 1, 1)) AS INT) AS first_byte
      |FROM documents""".stripMargin

  /** Partition-parallel "decode": the real-world slot for image resize /
    * audio feature extraction / video frame sampling. STUB: computes a
    * deterministic byte histogram summary instead of decoding media —
    * replace the body of `decodeBatch` with a real decoder in production.
    */
  def mm_features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions(decodeBatch).toDF("doc_id", "n_bytes", "byte_sum", "max_byte")
  }

  /** STUB decoder: deterministic fake features from raw bytes. A real
    * implementation would construct the (expensive) decoder once per
    * partition here and stream the batch through it. */
  private def decodeBatch(batch: Iterator[(Long, Array[Byte])]): Iterator[(Long, Long, Long, Int)] = {
    // e.g. val decoder = new JpegDecoder() — once per partition, not per row
    batch.map { case (id, bytes) =>
      var sum = 0L
      var mx = 0
      var i = 0
      while (i < bytes.length) {
        val u = bytes(i) & 0xff
        sum += u
        if (u > mx) mx = u
        i += 1
      }
      (id, bytes.length.toLong, sum, mx)
    }
  }

  // documents.text is pure ASCII in the fixtures, so codepoints == bytes and
  // the stub's byte arithmetic is expressible in ANSI SQL for the oracle.
  val mm_features_sql: String =
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_bytes,
      |  CAST(list_sum(list_transform(range(1, length(text)+1), i ->
      |    ord(substr(text, CAST(i AS INT), 1)))) AS BIGINT) AS byte_sum,
      |  CAST(list_max(list_transform(range(1, length(text)+1), i ->
      |    ord(substr(text, CAST(i AS INT), 1)))) AS INT) AS max_byte
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata" -> mm_metadata _,
    "mm_features" -> mm_features _,
  )

  val oracles: Map[String, String] = Map(
    "mm_metadata" -> mm_metadata_sql,
    "mm_features" -> mm_features_sql,
  )
}

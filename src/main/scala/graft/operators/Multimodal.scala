package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata, processed by partition-parallel decode
  * pipelines.
  *
  * The fixtures ship no media files, so `mm_features` SYNTHESIZES a real
  * container — a valid RIFF/WAV file per document (PCM u8 mono, sample rate
  * keyed off doc_id, samples = the text bytes) — and then runs a genuine
  * WAV header parser over the binary column: magic validation, little-endian
  * fmt-chunk field extraction, data-chunk scan. The parser would accept any
  * spec-conforming PCM WAV, not just the synthesized ones; the DuckDB oracle
  * recomputes the expected fields independently from the document columns,
  * so the gate verifies the construct -> parse round trip bit-for-bit.
  *
  * Scale: `mapPartitions` keeps decoder setup per-partition (the slot where
  * a real audio/image codec would be constructed once per task), no shuffle,
  * and the binary column never reaches the driver.
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

  /** Synthesize a valid PCM-u8 WAV per document, then parse it back with a
    * real RIFF reader (magics, LE fields, chunk walk). */
  def mm_features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { batch =>
      // a real codec would be constructed once per partition right here
      batch.map { case (id, textBytes) =>
        val wav = synthesizeWav(sampleRateFor(id), textBytes)
        parseWav(id, wav)
      }
    }.toDF("doc_id", "sample_rate", "n_channels", "bits_per_sample",
      "n_samples", "duration_ms", "max_amplitude")
  }

  /** Deterministic per-doc sample rate (8..15 kHz). */
  private def sampleRateFor(docId: Long): Int = (8000 + (docId % 8) * 1000).toInt

  /** Minimal but spec-correct WAV writer: RIFF/WAVE, 16-byte fmt chunk
    * (PCM, mono, u8), data chunk = the samples. */
  private[operators] def synthesizeWav(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(1) // PCM
    out.putShort(1) // mono
    out.putInt(sampleRate)
    out.putInt(sampleRate) // byte rate = rate * channels * bytesPerSample
    out.putShort(1) // block align
    out.putShort(8) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(samples.length)
    out.put(samples)
    out.array()
  }

  /** Real WAV header parse: validates magics, walks chunks, extracts fmt
    * fields, scans the data chunk for the peak u8 amplitude. */
  private[operators] def parseWav(id: Long, bytes: Array[Byte]): (Long, Int, Int, Int, Long, Long, Int) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def magic(expect: String): Unit = {
      val got = new Array[Byte](4); buf.get(got)
      require(new String(got, "US-ASCII") == expect, s"bad magic in doc $id: expected $expect")
    }
    magic("RIFF")
    val riffSize = buf.getInt
    require(riffSize == bytes.length - 8, s"RIFF size mismatch in doc $id")
    magic("WAVE")
    var sampleRate = 0; var channels = 0; var bits = 0
    var nSamples = 0L; var maxAmp = 0
    while (buf.remaining() >= 8) {
      val tag = new Array[Byte](4); buf.get(tag)
      val size = buf.getInt
      new String(tag, "US-ASCII") match {
        case "fmt " =>
          val fmtEnd = buf.position() + size
          val audioFormat = buf.getShort
          require(audioFormat == 1, s"not PCM in doc $id")
          channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          bits = buf.getShort
          buf.position(fmtEnd)
        case "data" =>
          nSamples = size.toLong / (channels * bits / 8)
          val end = buf.position() + size
          while (buf.position() < end) {
            val u = buf.get() & 0xff
            if (u > maxAmp) maxAmp = u
          }
        case _ => buf.position(buf.position() + size)
      }
    }
    val durationMs = nSamples * 1000L / sampleRate
    (id, sampleRate, channels, bits, nSamples, durationMs, maxAmp)
  }

  // The oracle derives every expected field independently from the document
  // columns (text is pure ASCII in the fixtures, so codepoints == bytes):
  // any construct/parse disagreement — magic offsets, LE encoding, chunk
  // sizes — breaks the match.
  val mm_features_sql: String =
    """SELECT doc_id,
      |  CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
      |  1 AS n_channels,
      |  8 AS bits_per_sample,
      |  CAST(length(text) AS BIGINT) AS n_samples,
      |  CAST((length(text) * 1000) // (8000 + (doc_id % 8) * 1000) AS BIGINT) AS duration_ms,
      |  CAST(list_max(list_transform(range(1, length(text)+1), i ->
      |    ord(substr(text, CAST(i AS INT), 1)))) AS INT) AS max_amplitude
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

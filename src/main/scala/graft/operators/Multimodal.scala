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

  /** Image modality: synthesize a spec-correct 8-bit BMP per document
    * (grayscale palette, bottom-up pixel rows, 4-byte row padding — the
    * layout details real image plumbing has to get right), then parse it
    * back: magic + size validation, header field extraction, padded
    * bottom-up row walk for the pixel scan. */
  def mm_image_meta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { batch =>
      batch.map { case (id, textBytes) =>
        val bmp = synthesizeBmp(widthFor(id), textBytes)
        parseBmp(id, bmp)
      }
    }.toDF("doc_id", "width", "height", "n_pixels", "row_stride", "max_pixel")
  }

  /** Deterministic per-doc image width (16..76 px, step 4). */
  private def widthFor(docId: Long): Int = (16 + (docId % 16) * 4).toInt

  /** Minimal but spec-correct 8bpp BMP writer: BITMAPFILEHEADER +
    * BITMAPINFOHEADER + 256-entry grayscale palette + bottom-up rows padded
    * to 4 bytes. Pixels = the text bytes row-major; the tail of the last
    * row is zero. */
  private[operators] def synthesizeBmp(width: Int, pixels: Array[Byte]): Array[Byte] = {
    val height = math.max(1, (pixels.length + width - 1) / width)
    val stride = ((width + 3) / 4) * 4
    val dataOffset = 14 + 40 + 256 * 4
    val fileSize = dataOffset + stride * height
    val out = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(dataOffset)
    out.putInt(40).putInt(width).putInt(height) // positive height = bottom-up
      .putShort(1).putShort(8).putInt(0)        // planes, bpp, BI_RGB
      .putInt(stride * height).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var i = 0
    while (i < 256) { out.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte); i += 1 }
    // rows are stored bottom-up: logical row r lands at (height - 1 - r)
    val rows = new Array[Byte](stride * height)
    i = 0
    while (i < pixels.length) {
      val r = i / width
      rows((height - 1 - r) * stride + (i % width)) = pixels(i)
      i += 1
    }
    out.put(rows)
    out.array()
  }

  /** Real BMP parse: magics, size checks, LE header fields, bottom-up
    * padded row walk scanning for the peak pixel. */
  private[operators] def parseBmp(id: Long, bytes: Array[Byte]): (Long, Int, Int, Long, Int, Int) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, s"bad BMP magic in doc $id")
    val fileSize = buf.getInt
    require(fileSize == bytes.length, s"BMP size mismatch in doc $id")
    buf.getShort; buf.getShort
    val dataOffset = buf.getInt
    require(buf.getInt == 40, s"unexpected DIB header in doc $id")
    val width = buf.getInt
    val height = buf.getInt
    require(buf.getShort == 1, s"bad plane count in doc $id")
    val bpp = buf.getShort
    require(bpp == 8, s"not 8bpp in doc $id")
    require(buf.getInt == 0, s"compressed BMP in doc $id")
    val stride = ((width * bpp / 8) + 3) / 4 * 4
    var maxPixel = 0
    var r = 0
    while (r < height) {
      val rowStart = dataOffset + (height - 1 - r) * stride // bottom-up
      var c = 0
      while (c < width) {
        val u = bytes(rowStart + c) & 0xff
        if (u > maxPixel) maxPixel = u
        c += 1
      }
      r += 1
    }
    (id, width, height, width.toLong * height, stride, maxPixel)
  }

  // Oracle: every field derived independently from the document columns —
  // any disagreement in offsets, padding, or the bottom-up row order breaks
  // the construct -> parse round trip. max over all pixels equals max over
  // the text bytes because pad pixels are zero and fixture text is ASCII.
  val mm_image_meta_sql: String =
    """SELECT doc_id,
      |  CAST(16 + (doc_id % 16) * 4 AS INT) AS width,
      |  CAST(greatest(1, (length(text) + (16 + (doc_id % 16) * 4) - 1)
      |                   // (16 + (doc_id % 16) * 4)) AS INT) AS height,
      |  CAST((16 + (doc_id % 16) * 4)
      |       * greatest(1, (length(text) + (16 + (doc_id % 16) * 4) - 1)
      |                     // (16 + (doc_id % 16) * 4)) AS BIGINT) AS n_pixels,
      |  CAST((((16 + (doc_id % 16) * 4) + 3) // 4) * 4 AS INT) AS row_stride,
      |  CAST(list_max(list_transform(range(1, length(text)+1), i ->
      |    ord(substr(text, CAST(i AS INT), 1)))) AS INT) AS max_pixel
      |FROM documents""".stripMargin

  /** Video modality: synthesize a spec-correct YUV4MPEG2 (Y4M) stream per
    * document — textual stream header (`YUV4MPEG2 W8 H4 F25:1 Ip A1:1
    * Cmono`), `FRAME` markers, raw mono luma planes = the text bytes chunked
    * into 8x4 frames — then parse it back (header tokenization, frame walk)
    * sampling every [[FrameStride]]-th frame, the standard frame-sampling
    * step of a video-training pipeline. The parser accepts any
    * spec-conforming mono Y4M; the oracle recomputes frame counts and the
    * sampled-frame luma peak independently from the text column. */
  private val VidW = 8
  private val VidH = 4
  private val FrameStride = 5 // sample frames 0, 5, 10, ...
  private val FrameBytes = VidW * VidH

  def mm_frame_sample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { batch =>
      batch.map { case (id, textBytes) =>
        val y4m = synthesizeY4m(textBytes)
        parseY4mSampling(id, y4m)
      }
    }.toDF("doc_id", "width", "height", "n_frames", "n_sampled",
      "duration_ms", "max_luma_sampled")
  }

  /** Minimal but spec-correct Y4M writer: mono 8x4 @ 25fps, luma = the text
    * bytes row-major, last frame zero-padded. */
  private[operators] def synthesizeY4m(luma: Array[Byte]): Array[Byte] = {
    val nFrames = math.max(1, (luma.length + FrameBytes - 1) / FrameBytes)
    val header = s"YUV4MPEG2 W$VidW H$VidH F25:1 Ip A1:1 Cmono\n".getBytes("US-ASCII")
    val frameMark = "FRAME\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(
      header.length + nFrames * (frameMark.length + FrameBytes))
    out.put(header)
    var f = 0
    while (f < nFrames) {
      out.put(frameMark)
      val start = f * FrameBytes
      var i = 0
      while (i < FrameBytes) {
        out.put(if (start + i < luma.length) luma(start + i) else 0.toByte)
        i += 1
      }
      f += 1
    }
    out.array()
  }

  /** Real Y4M parse with frame sampling: tokenize the stream header (W/H/F
    * parameters, mono color space required), walk FRAME sections, and scan
    * only every [[FrameStride]]-th frame for the luma peak — the skipped
    * frames are never decoded, which is the point of sampling. */
  private[operators] def parseY4mSampling(id: Long, bytes: Array[Byte]): (Long, Int, Int, Long, Long, Long, Int) = {
    var pos = 0
    def readLine(): String = {
      val start = pos
      while (bytes(pos) != '\n'.toByte) pos += 1
      pos += 1
      new String(bytes, start, pos - 1 - start, "US-ASCII")
    }
    val header = readLine()
    require(header.startsWith("YUV4MPEG2 "), s"bad Y4M magic in doc $id")
    var w = 0; var h = 0; var fpsNum = 0; var fpsDen = 1
    header.drop("YUV4MPEG2 ".length).split(' ').foreach { tok =>
      tok.head match {
        case 'W' => w = tok.tail.toInt
        case 'H' => h = tok.tail.toInt
        case 'F' =>
          val Array(n, d) = tok.tail.split(':'); fpsNum = n.toInt; fpsDen = d.toInt
        case 'C' => require(tok == "Cmono", s"not mono in doc $id")
        case _ => () // Ip, A1:1, X-extensions: irrelevant to sampling
      }
    }
    val frameSize = w * h
    var nFrames = 0L; var nSampled = 0L; var maxLuma = 0
    while (pos < bytes.length) {
      val mark = readLine()
      require(mark == "FRAME" || mark.startsWith("FRAME "), s"bad frame marker in doc $id")
      if (nFrames % FrameStride == 0) {
        nSampled += 1
        var i = 0
        while (i < frameSize) {
          val u = bytes(pos + i) & 0xff
          if (u > maxLuma) maxLuma = u
          i += 1
        }
      }
      pos += frameSize
      nFrames += 1
    }
    val durationMs = nFrames * 1000L * fpsDen / fpsNum
    (id, w, h, nFrames, nSampled, durationMs, maxLuma)
  }

  // Oracle: frame geometry and the sampled-frame luma peak derived from the
  // text column alone — frame f covers text bytes [f*32, f*32+32) and only
  // frames with f % 5 = 0 contribute to the max (pad bytes are zero).
  val mm_frame_sample_sql: String =
    s"""SELECT doc_id,
       |  $VidW AS width, $VidH AS height,
       |  CAST(greatest(1, (length(text) + ${FrameBytes - 1}) // $FrameBytes) AS BIGINT) AS n_frames,
       |  CAST((greatest(1, (length(text) + ${FrameBytes - 1}) // $FrameBytes) + ${FrameStride - 1}) // $FrameStride AS BIGINT) AS n_sampled,
       |  CAST(greatest(1, (length(text) + ${FrameBytes - 1}) // $FrameBytes) * 40 AS BIGINT) AS duration_ms,
       |  CAST(list_max(list_transform(range(1, length(text)+1), i ->
       |    CASE WHEN (((i-1) // $FrameBytes) % $FrameStride) = 0
       |         THEN ord(substr(text, CAST(i AS INT), 1)) ELSE 0 END)) AS INT) AS max_luma_sampled
       |FROM documents""".stripMargin

  /** Shot-boundary (scene-cut) detection over the synthesized Y4M streams —
    * the standard first pass of video curation (split footage at cuts, then
    * sample/caption per shot). A cut is declared between consecutive frames
    * whose total-luma difference is at least [[SceneCutThreshold]]; output
    * is the cut count and the first cut's frame index (-1 when none). All
    * integer (luma sums compared directly), so the oracle reproduces the
    * decisions exactly from the text column. Scale: pure map over the
    * binary column via the same partition-parallel codec path as the other
    * container ops — no shuffle at any corpus size. */
  private[operators] val SceneCutThreshold = 200

  def mm_scene_cut(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { batch =>
      batch.map { case (id, textBytes) =>
        val y4m = synthesizeY4m(textBytes)
        parseY4mSceneCuts(id, y4m)
      }
    }.toDF("doc_id", "n_frames", "n_cuts", "first_cut")
  }

  private[operators] def parseY4mSceneCuts(id: Long, bytes: Array[Byte]): (Long, Long, Long, Long) = {
    var pos = 0
    def readLine(): String = {
      val start = pos
      while (bytes(pos) != '\n'.toByte) pos += 1
      pos += 1
      new String(bytes, start, pos - 1 - start, "US-ASCII")
    }
    val header = readLine()
    require(header.startsWith("YUV4MPEG2 "), s"bad Y4M magic in doc $id")
    var w = 0; var h = 0
    header.drop("YUV4MPEG2 ".length).split(' ').foreach { tok =>
      tok.head match {
        case 'W' => w = tok.tail.toInt
        case 'H' => h = tok.tail.toInt
        case 'C' => require(tok == "Cmono", s"not mono in doc $id")
        case _ => ()
      }
    }
    val frameSize = w * h
    var nFrames = 0L; var nCuts = 0L; var firstCut = -1L; var prevSum = 0L
    while (pos < bytes.length) {
      val mark = readLine()
      require(mark == "FRAME" || mark.startsWith("FRAME "), s"bad frame marker in doc $id")
      var sum = 0L
      var i = 0
      while (i < frameSize) {
        sum += (bytes(pos + i) & 0xff)
        i += 1
      }
      if (nFrames > 0 && math.abs(sum - prevSum) >= SceneCutThreshold) {
        nCuts += 1
        if (firstCut < 0) firstCut = nFrames
      }
      prevSum = sum
      pos += frameSize
      nFrames += 1
    }
    (id, nFrames, nCuts, firstCut)
  }

  // Oracle: per-frame luma sums from the text column (frame f covers text
  // bytes [f*32, f*32+32), pad bytes zero), cut decisions re-derived with
  // the same integer threshold.
  val mm_scene_cut_sql: String =
    s"""WITH f AS (SELECT doc_id,
       |    greatest(1, (length(text) + ${FrameBytes - 1}) // $FrameBytes) AS nf,
       |    list_transform(range(0, greatest(1, (length(text) + ${FrameBytes - 1}) // $FrameBytes)), f ->
       |      list_sum(list_transform(range(1, ${FrameBytes + 1}), j ->
       |        CASE WHEN f * $FrameBytes + j <= length(text)
       |             THEN ord(substr(text, CAST(f * $FrameBytes + j AS INT), 1))
       |             ELSE 0 END))) AS sums
       |  FROM documents),
       |c AS (SELECT doc_id, nf,
       |    list_filter(range(1, nf), f ->
       |      abs(sums[f + 1] - sums[f]) >= $SceneCutThreshold) AS cuts
       |  FROM f)
       |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
       |       CAST(len(cuts) AS BIGINT) AS n_cuts,
       |       CAST(coalesce(list_min(cuts), -1) AS BIGINT) AS first_cut
       |FROM c""".stripMargin

  /** Video-level dedup on DECODED content, not container bytes: two Y4M
    * streams whose bytes differ (header extensions, frame padding) but
    * whose decoded frames match are duplicates — so the fingerprint is
    * computed over the parsed per-frame luma-sum sequence. Two axes per
    * video: `vfp` (md5 of the exact sum sequence — the exact-dup group
    * key; grouped into rep + copy count like [[Dedup.dedup_exact]]) and
    * `tdhash` (a temporal difference hash — bit f set when frame f+1's
    * luma exceeds frame f's, capped at 59 transitions — the banding-ready
    * near-dup axis, same family as [[mm_phash]]). The oracle re-derives
    * both from the text column alone.
    *
    * Scale: decode + fingerprint is a pure map through the partition-
    * parallel codec path (video bytes never shuffle — only the 16-byte
    * fingerprint and 8-byte hash leave the decoder); the group stats are
    * one hash aggregate on `vfp` and a join back that Catalyst broadcasts
    * while the group table fits. Same cost class as exact text dedup. */
  def mm_video_dedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    val fps = ds.mapPartitions { batch =>
      batch.map { case (id, textBytes) =>
        requireAscii(id, textBytes)
        val y4m = synthesizeY4m(textBytes)
        parseY4mFingerprint(id, y4m)
      }
    }.toDF("doc_id", "n_frames", "vfp", "tdhash")
    val groups = fps.groupBy(col("vfp"))
      .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_copies"))
    fps.join(groups, "vfp")
      .select(col("doc_id"), col("n_frames"), col("vfp"), col("tdhash"),
        col("rep_doc_id"), col("n_copies"))
  }

  /** Parse a mono Y4M stream and fold its frames into the two video
    * fingerprints: the exact sum-sequence md5 and the temporal dHash. */
  private[operators] def parseY4mFingerprint(id: Long, bytes: Array[Byte]): (Long, Long, String, Long) = {
    var pos = 0
    def readLine(): String = {
      val start = pos
      while (bytes(pos) != '\n'.toByte) pos += 1
      pos += 1
      new String(bytes, start, pos - 1 - start, "US-ASCII")
    }
    val header = readLine()
    require(header.startsWith("YUV4MPEG2 "), s"bad Y4M magic in doc $id")
    var w = 0; var h = 0
    header.drop("YUV4MPEG2 ".length).split(' ').foreach { tok =>
      tok.head match {
        case 'W' => w = tok.tail.toInt
        case 'H' => h = tok.tail.toInt
        case 'C' => require(tok == "Cmono", s"not mono in doc $id")
        case _ => ()
      }
    }
    val frameSize = w * h
    val sums = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (pos < bytes.length) {
      val mark = readLine()
      require(mark == "FRAME" || mark.startsWith("FRAME "), s"bad frame marker in doc $id")
      var sum = 0L
      var i = 0
      while (i < frameSize) {
        sum += (bytes(pos + i) & 0xff)
        i += 1
      }
      sums += sum
      pos += frameSize
    }
    val seq = sums.mkString(",")
    val vfp = java.security.MessageDigest.getInstance("MD5")
      .digest(seq.getBytes("US-ASCII")).map(b => f"$b%02x").mkString
    var tdhash = 0L
    var f = 0
    while (f < math.min(59, sums.length - 1)) {
      if (sums(f + 1) > sums(f)) tdhash |= 1L << f
      f += 1
    }
    (id, sums.length.toLong, vfp, tdhash)
  }

  // Oracle: the same per-frame luma-sum list as the scene-cut oracle, then
  // md5 over the comma-joined sequence and the transition bits as a sum of
  // powers of two.
  val mm_video_dedup_sql: String =
    s"""WITH f AS (SELECT doc_id,
       |    greatest(1, (length(text) + ${FrameBytes - 1}) // $FrameBytes) AS nf,
       |    list_transform(range(0, greatest(1, (length(text) + ${FrameBytes - 1}) // $FrameBytes)), f ->
       |      list_sum(list_transform(range(1, ${FrameBytes + 1}), j ->
       |        CASE WHEN f * $FrameBytes + j <= length(text)
       |             THEN ord(substr(text, CAST(f * $FrameBytes + j AS INT), 1))
       |             ELSE 0 END))) AS sums
       |  FROM documents),
       |fp AS (SELECT doc_id, nf, md5(array_to_string(sums, ',')) AS vfp,
       |    coalesce(list_sum(list_transform(range(1, CAST(least(59, nf - 1) AS BIGINT) + 1), i ->
       |      CASE WHEN sums[i + 1] > sums[i] THEN 1 << (i - 1) ELSE 0 END)), 0) AS tdhash
       |  FROM f),
       |g AS (SELECT vfp, min(doc_id) AS rep_doc_id, count(*) AS n_copies
       |  FROM fp GROUP BY 1)
       |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames, vfp,
       |       CAST(tdhash AS BIGINT) AS tdhash,
       |       rep_doc_id, CAST(n_copies AS BIGINT) AS n_copies
       |FROM fp JOIN g USING (vfp)""".stripMargin

  /** Image perceptual fingerprint: a difference hash (dHash family) over
    * each synthesized BMP's per-row luma profile — bit r is set when row r's
    * luma sum exceeds row r+1's (rows in logical top-down order, walked
    * through the bottom-up padded layout), capped at 60 bits — plus a
    * 16-bit band prefix for bucketed near-dup joins, mirroring
    * [[Dedup.dedup_simhash]]'s banding. Integer-only (sums compared
    * directly, same row width), so the oracle reproduces the exact hash
    * from the text column. Scale: pure map over the binary column, no
    * shuffle; the downstream band join is the same bounded-bucket shape as
    * the text-side fingerprint joins. */
  def mm_phash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions(phashPartition).toDF("doc_id", "width", "height", "phash", "band16")
  }

  /** The synthesize→parse→dHash kernel as a partition function, shared by
    * the batch scan above and the streaming near-dup gate (the decode step
    * is per-partition stateless either way). */
  private[graft] def phashPartition(
      batch: Iterator[(Long, Array[Byte])]): Iterator[(Long, Int, Int, Long, Long)] =
    batch.map { case (id, textBytes) =>
      requireAscii(id, textBytes)
      parseBmpPhash(id, synthesizeBmp(widthFor(id), textBytes))
    }

  /** Parse the BMP (magic, LE header, bottom-up padded rows) and fold the
    * logical-order row-sum profile into the difference hash. */
  private[operators] def parseBmpPhash(id: Long, bytes: Array[Byte]): (Long, Int, Int, Long, Long) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, s"bad BMP magic in doc $id")
    require(buf.getInt == bytes.length, s"BMP size mismatch in doc $id")
    buf.getShort; buf.getShort
    val dataOffset = buf.getInt
    require(buf.getInt == 40, s"unexpected DIB header in doc $id")
    val width = buf.getInt
    val height = buf.getInt
    buf.getShort // planes
    val bpp = buf.getShort
    require(bpp == 8, s"not 8bpp in doc $id")
    val stride = ((width * bpp / 8) + 3) / 4 * 4
    def rowSum(r: Int): Long = {
      val rowStart = dataOffset + (height - 1 - r) * stride // bottom-up
      var c = 0; var sum = 0L
      while (c < width) { sum += bytes(rowStart + c) & 0xff; c += 1 }
      sum
    }
    var phash = 0L
    val top = math.min(height - 1, 60)
    var r = 0
    while (r < top) {
      if (rowSum(r) > rowSum(r + 1)) phash |= 1L << r
      r += 1
    }
    (id, width, height, phash, phash >>> 44)
  }

  // Oracle: row r of the image covers text bytes [r*w, r*w + w) (pads are
  // zero), so the per-row sums — and therefore every hash bit — are
  // recomputable from the text column with integer arithmetic alone.
  val mm_phash_sql: String =
    """WITH g AS (SELECT doc_id, text, length(text) AS len,
      |        CAST(16 + (doc_id % 16) * 4 AS BIGINT) AS w,
      |        greatest(1, (length(text) + (16 + (doc_id % 16) * 4) - 1)
      |                    // (16 + (doc_id % 16) * 4)) AS h
      |      FROM documents),
      |p AS (SELECT doc_id, w, h,
      |   CAST(COALESCE(list_sum(list_transform(range(0, least(h - 1, 60)), r ->
      |     CASE WHEN
      |       COALESCE(list_sum(list_transform(range(r*w + 1, r*w + w + 1), i ->
      |         CASE WHEN i <= len THEN ord(substr(text, CAST(i AS INT), 1)) ELSE 0 END)), 0)
      |       >
      |       COALESCE(list_sum(list_transform(range((r+1)*w + 1, (r+1)*w + w + 1), i ->
      |         CASE WHEN i <= len THEN ord(substr(text, CAST(i AS INT), 1)) ELSE 0 END)), 0)
      |     THEN (CAST(1 AS BIGINT) << CAST(r AS INT)) ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS phash
      | FROM g)
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |       phash, phash >> 44 AS band16
      |FROM p""".stripMargin

  /** REAL image codec path — PNG via `javax.imageio` (JDK-public, offline):
    * each document's pixel grid (the same grid [[mm_phash]] packs into a
    * BMP) is ENCODED to an actual PNG byte stream and DECODED back through
    * the JDK's PNG reader — DEFLATE decompression, scanline unfiltering,
    * gray-colormodel mapping — then fingerprinted with the identical
    * row-profile dHash. The oracle is [[mm_phash_sql]] verbatim: a green
    * hash proves the real codec round-trips every pixel (decoded-equal ⇒
    * fingerprint-equal, the [[mm_video_dedup]] container-invariance
    * pattern), closing the synthetic-formats-only gap. Scale: pure map
    * over the binary column, no shuffle; per-row cost is the codec itself,
    * exactly what a production decode stage pays. */
  def mm_image_decode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { batch =>
      batch.map { case (id, textBytes) =>
        requireAscii(id, textBytes)
        val png = synthesizePng(widthFor(id), textBytes)
        decodePngPhash(id, png)
      }
    }.toDF("doc_id", "width", "height", "phash", "band16")
  }

  /** 8-bit grayscale PNG writer via the JDK encoder. Row-major text-byte
    * pixels, zero-padded last row — the same logical grid as
    * [[synthesizeBmp]], through a real compressed format. */
  private[operators] def synthesizePng(width: Int, pixels: Array[Byte]): Array[Byte] = {
    val height = math.max(1, (pixels.length + width - 1) / width)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < pixels.length) {
      raster.setSample(i % width, i / width, 0, pixels(i) & 0xff)
      i += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", baos),
      "JDK has no PNG writer registered")
    baos.toByteArray
  }

  /** Decode the PNG with the JDK reader and fold the decoded raster's
    * logical-order row-sum profile into the same difference hash as
    * [[parseBmpPhash]] — bit-equal output proves pixel-exact decode. */
  private[operators] def decodePngPhash(id: Long, bytes: Array[Byte]): (Long, Int, Int, Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"PNG decode failed for doc $id")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    def rowSum(r: Int): Long = {
      var c = 0; var sum = 0L
      while (c < w) { sum += raster.getSample(c, r, 0); c += 1 }
      sum
    }
    var phash = 0L
    val top = math.min(h - 1, 60)
    var r = 0
    while (r < top) {
      if (rowSum(r) > rowSum(r + 1)) phash |= 1L << r
      r += 1
    }
    (id, w, h, phash, phash >>> 44)
  }

  /** Same oracle as [[mm_phash]]: the decode path must reproduce the exact
    * fingerprint the uncompressed path computes. */
  val mm_image_decode_sql: String = mm_phash_sql

  /** Image RESIZE — the thumbnailing step of an image-training pipeline
    * (decode → nearest-neighbor downscale → compact features), the one
    * multimodal stage [[mm_phash]]'s row-profile hash doesn't cover: the
    * full BMP is decoded (magic, LE header, bottom-up padded rows) and
    * sampled to a fixed [[ThumbDim]]×[[ThumbDim]] grid with the standard
    * nearest-neighbor map `src = (dst · srcDim) / thumbDim` in integer
    * arithmetic. Emitted features are the thumbnail's pixel sum and a
    * position-weighted checksum (Σ (i+1)·pixel_i in row-major order) that
    * pins every sampled pixel's VALUE AND POSITION, so the oracle — which
    * recomputes the grid independently from the text column — catches any
    * off-by-one in the sampling map or the bottom-up row walk. Pure map
    * over the binary column, no shuffle at any scale. */
  private val ThumbDim = 8

  def mm_resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { batch =>
      batch.map { case (id, textBytes) =>
        requireAscii(id, textBytes)
        val bmp = synthesizeBmp(widthFor(id), textBytes)
        resizeBmp(id, bmp)
      }
    }.toDF("doc_id", "width", "height", "thumb_sum", "thumb_chk")
  }

  /** Decode the BMP and nearest-neighbor-sample the [[ThumbDim]]² grid. */
  private[operators] def resizeBmp(id: Long, bytes: Array[Byte]): (Long, Int, Int, Long, Long) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, s"bad BMP magic in doc $id")
    require(buf.getInt == bytes.length, s"BMP size mismatch in doc $id")
    buf.getShort; buf.getShort
    val dataOffset = buf.getInt
    require(buf.getInt == 40, s"unexpected DIB header in doc $id")
    val width = buf.getInt
    val height = buf.getInt
    buf.getShort // planes
    val bpp = buf.getShort
    require(bpp == 8, s"not 8bpp in doc $id")
    val stride = ((width * bpp / 8) + 3) / 4 * 4
    def pixel(r: Int, c: Int): Int =
      bytes(dataOffset + (height - 1 - r) * stride + c) & 0xff // bottom-up
    var sum = 0L
    var chk = 0L
    var i = 0
    while (i < ThumbDim * ThumbDim) {
      val sr = (i / ThumbDim) * height / ThumbDim
      val sc = (i % ThumbDim) * width / ThumbDim
      val u = pixel(sr, sc)
      sum += u
      chk += (i + 1).toLong * u
      i += 1
    }
    (id, width, height, sum, chk)
  }

  // Oracle: thumbnail pixel i samples logical (row, col) =
  // ((i//8)*h//8, (i%8)*w//8), which is text byte row*w+col when inside the
  // text and a zero pad otherwise — the whole grid is recomputable from the
  // text column with integer arithmetic alone.
  val mm_resize_sql: String =
    """WITH g AS (SELECT doc_id, text, length(text) AS len,
      |        CAST(16 + (doc_id % 16) * 4 AS BIGINT) AS w,
      |        greatest(1, (length(text) + (16 + (doc_id % 16) * 4) - 1)
      |                    // (16 + (doc_id % 16) * 4)) AS h
      |      FROM documents),
      |p AS (SELECT doc_id, w, h,
      |   list_transform(range(0, 64), t ->
      |     CASE WHEN ((t // 8) * h // 8) * w + ((t % 8) * w // 8) < len
      |       THEN ord(substr(text,
      |              CAST(((t // 8) * h // 8) * w + ((t % 8) * w // 8) + 1 AS INT), 1))
      |       ELSE 0 END) AS px
      | FROM g)
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  CAST(list_sum(px) AS BIGINT) AS thumb_sum,
      |  CAST(list_sum(list_transform(range(0, 64), t -> (t + 1) * px[CAST(t + 1 AS INT)]))
      |       AS BIGINT) AS thumb_chk
      |FROM p""".stripMargin

  /** Audio fingerprint: a window-energy difference hash over each
    * synthesized WAV's data chunk — the samples are cut into fixed
    * [[AudioWin]]-sample windows and bit w is set when window w's energy sum
    * exceeds window w+1's (capped at 60 bits), plus the same 16-bit band
    * prefix as [[mm_phash]] / [[Dedup.dedup_simhash]] for bucketed near-dup
    * joins — the audio-modality analogue of image dHash. Integer-only, so
    * the oracle rebuilds the exact hash from the text column. Pure map, no
    * shuffle. */
  private val AudioWin = 64

  def mm_audio_fp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { batch =>
      batch.map { case (id, textBytes) =>
        requireAscii(id, textBytes)
        val wav = synthesizeWav(sampleRateFor(id), textBytes)
        parseWavFingerprint(id, wav)
      }
    }.toDF("doc_id", "n_samples", "n_windows", "afp", "band16")
  }

  /** The fingerprint oracles compare UTF-8 BYTES (engine side) against
    * `ord(substr(text, i, 1))` CODE POINTS (SQL side) — identical only for
    * ASCII text, which the synthetic fixture guarantees. Asserted loudly so
    * a non-ASCII corpus fails the job instead of silently diverging from
    * the oracle. */
  private def requireAscii(id: Long, textBytes: Array[Byte]): Unit =
    require(!textBytes.exists(_ < 0),
      s"doc $id contains non-ASCII text: the byte-exact fingerprint oracle " +
        "only holds for ASCII corpora (bytes == code points)")

  /** Walk the RIFF chunks to the data section, then fold the per-window
    * u8-energy profile into the difference hash. */
  private[operators] def parseWavFingerprint(id: Long, bytes: Array[Byte],
      win: Int = AudioWin): (Long, Long, Long, Long, Long) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def magic(expect: String): Unit = {
      val got = new Array[Byte](4); buf.get(got)
      require(new String(got, "US-ASCII") == expect, s"bad magic in doc $id: expected $expect")
    }
    magic("RIFF"); buf.getInt; magic("WAVE")
    var dataStart = -1; var dataLen = 0
    while (buf.remaining() >= 8 && dataStart < 0) {
      val tag = new Array[Byte](4); buf.get(tag)
      val size = buf.getInt
      if (new String(tag, "US-ASCII") == "data") { dataStart = buf.position(); dataLen = size }
      else buf.position(buf.position() + size)
    }
    require(dataStart >= 0, s"no data chunk in doc $id")
    val nWindows = math.max(1L, (dataLen + win - 1L) / win)
    def winSum(w: Long): Long = {
      var i = w * win; val end = math.min(i + win, dataLen.toLong)
      var s = 0L
      while (i < end) { s += bytes(dataStart + i.toInt) & 0xff; i += 1 }
      s
    }
    var afp = 0L
    val top = math.min(nWindows - 1, 60L)
    var w = 0L
    while (w < top) {
      if (winSum(w) > winSum(w + 1)) afp |= 1L << w
      w += 1
    }
    (id, dataLen.toLong, nWindows, afp, afp >>> 44)
  }

  // Oracle: the WAV data chunk IS the text bytes, so window w covers text
  // [w*64, w*64 + 64) and every hash bit is integer arithmetic over ord().
  val mm_audio_fp_sql: String =
    s"""WITH g AS (SELECT doc_id, text, length(text) AS len,
      |        greatest(1, (length(text) + ${AudioWin - 1}) // $AudioWin) AS nw
      |      FROM documents),
      |p AS (SELECT doc_id, len, nw,
      |   CAST(COALESCE(list_sum(list_transform(range(0, least(nw - 1, 60)), w ->
      |     CASE WHEN
      |       COALESCE(list_sum(list_transform(range(w*$AudioWin + 1, w*$AudioWin + ${AudioWin + 1}), i ->
      |         CASE WHEN i <= len THEN ord(substr(text, CAST(i AS INT), 1)) ELSE 0 END)), 0)
      |       >
      |       COALESCE(list_sum(list_transform(range((w+1)*$AudioWin + 1, (w+1)*$AudioWin + ${AudioWin + 1}), i ->
      |         CASE WHEN i <= len THEN ord(substr(text, CAST(i AS INT), 1)) ELSE 0 END)), 0)
      |     THEN (CAST(1 AS BIGINT) << CAST(w AS INT)) ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS afp
      | FROM g)
      |SELECT doc_id, CAST(len AS BIGINT) AS n_samples, CAST(nw AS BIGINT) AS n_windows,
      |       afp, afp >> 44 AS band16
      |FROM p""".stripMargin

  /** Silence-span detection — the audio-pipeline step that trims dead air /
    * segments voice activity before transcription. A window of
    * [[AudioWin]] samples is "silent" when its mean energy falls below 98%
    * of the whole clip's mean (integer cross-multiplication — no division,
    * no floats: `winSum·len·1000 < docSum·winLen·980`); maximal silent runs
    * are folded into per-clip span statistics inside the same one-pass
    * RIFF parser as [[mm_audio_fp]] (two passes over the data chunk: clip
    * sum, then window fold — still O(bytes), still a pure map with zero
    * shuffle at any corpus size). The oracle rebuilds the identical spans
    * relationally: unnest windows → gaps-and-islands over the silent flag —
    * so the imperative codec fold is verified against a declarative
    * formulation bit-for-bit. */
  def mm_silence_detect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { batch =>
      batch.map { case (id, textBytes) =>
        requireAscii(id, textBytes)
        val wav = synthesizeWav(sampleRateFor(id), textBytes)
        parseWavSilence(id, wav)
      }
    }.toDF("doc_id", "n_windows", "n_silent", "n_spans", "longest_run")
  }

  /** Walk to the data chunk, then fold window energies into silent-run
    * statistics (count, spans, longest). */
  private[operators] def parseWavSilence(id: Long, bytes: Array[Byte]): (Long, Long, Long, Long, Long) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def magic(expect: String): Unit = {
      val got = new Array[Byte](4); buf.get(got)
      require(new String(got, "US-ASCII") == expect, s"bad magic in doc $id: expected $expect")
    }
    magic("RIFF"); buf.getInt; magic("WAVE")
    var dataStart = -1; var dataLen = 0
    while (buf.remaining() >= 8 && dataStart < 0) {
      val tag = new Array[Byte](4); buf.get(tag)
      val size = buf.getInt
      if (new String(tag, "US-ASCII") == "data") { dataStart = buf.position(); dataLen = size }
      else buf.position(buf.position() + size)
    }
    require(dataStart >= 0, s"no data chunk in doc $id")
    var docSum = 0L
    var i = 0
    while (i < dataLen) { docSum += bytes(dataStart + i) & 0xff; i += 1 }
    val nWindows = math.max(1L, (dataLen + AudioWin - 1L) / AudioWin)
    var nSilent = 0L; var nSpans = 0L; var longest = 0L; var run = 0L
    var w = 0L
    while (w < nWindows) {
      val start = w * AudioWin
      val end = math.min(start + AudioWin, dataLen.toLong)
      var winSum = 0L
      var j = start
      while (j < end) { winSum += bytes(dataStart + j.toInt) & 0xff; j += 1 }
      val winLen = end - start
      val silent = winSum * dataLen * 1000L < docSum * winLen * 980L
      if (silent) {
        nSilent += 1; run += 1
        if (run == 1) nSpans += 1
        if (run > longest) longest = run
      } else run = 0
      w += 1
    }
    (id, nWindows, nSilent, nSpans, longest)
  }

  val mm_silence_detect_sql: String =
    s"""WITH g AS (SELECT doc_id, text, length(text) AS len,
       |        greatest(1, (length(text) + ${AudioWin - 1}) // $AudioWin) AS nw,
       |        COALESCE(list_sum(list_transform(range(1, length(text) + 1), i ->
       |          ord(substr(text, CAST(i AS INT), 1)))), 0) AS docsum
       |      FROM documents),
       |wrows AS (SELECT doc_id, text, len, nw, docsum, unnest(range(0, nw)) AS w FROM g),
       |e AS (SELECT doc_id, w,
       |        COALESCE(list_sum(list_transform(
       |          range(w * $AudioWin + 1, least((w + 1) * $AudioWin, len) + 1), i ->
       |          ord(substr(text, CAST(i AS INT), 1)))), 0) * len * 1000
       |          < docsum * (least((w + 1) * $AudioWin, len) - w * $AudioWin) * 980 AS silent
       |      FROM wrows),
       |s AS (SELECT doc_id, w, silent,
       |        w - row_number() OVER (PARTITION BY doc_id, silent ORDER BY w) AS grp
       |      FROM e),
       |spans AS (SELECT doc_id, count(*) AS run FROM s WHERE silent GROUP BY doc_id, grp),
       |agg AS (SELECT doc_id, CAST(sum(run) AS BIGINT) AS n_silent,
       |          CAST(count(*) AS BIGINT) AS n_spans, CAST(max(run) AS BIGINT) AS longest_run
       |        FROM spans GROUP BY doc_id)
       |SELECT g.doc_id, CAST(g.nw AS BIGINT) AS n_windows,
       |  COALESCE(a.n_silent, 0) AS n_silent,
       |  COALESCE(a.n_spans, 0) AS n_spans,
       |  COALESCE(a.longest_run, 0) AS longest_run
       |FROM g LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** Container ROUTING over a mixed binary column — the dispatch step of a
    * real multimodal lake, where one blob column carries many formats and
    * per-row work is chosen by sniffing magic bytes, never by trusting a
    * metadata column. Each doc synthesizes a different container by
    * doc_id % 3 (WAV / BMP / Y4M); the probe identifies the format from
    * the magic alone and extracts the payload size with the right parser.
    * The oracle recomputes both from the text column and the synthesis
    * arithmetic, so a misrouted or misparsed row hash-fails. Pure map. */
  def mm_container_probe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { batch =>
      batch.map { case (id, textBytes) =>
        val blob = (id % 3) match {
          case 0 => synthesizeWav(sampleRateFor(id), textBytes)
          case 1 => synthesizeBmp(widthFor(id), textBytes)
          case _ => synthesizeY4m(textBytes)
        }
        probeContainer(id, blob)
      }
    }.toDF("doc_id", "container", "payload_bytes")
  }

  /** Magic-byte sniffing + per-format payload sizing. */
  private[operators] def probeContainer(id: Long, bytes: Array[Byte]): (Long, String, Long) = {
    def ascii(from: Int, len: Int): String =
      if (bytes.length >= from + len) new String(bytes, from, len, "US-ASCII") else ""
    if (ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.position(12)
      var dataLen = -1L
      while (buf.remaining() >= 8 && dataLen < 0) {
        val tag = new Array[Byte](4); buf.get(tag)
        val size = buf.getInt
        if (new String(tag, "US-ASCII") == "data") dataLen = size.toLong
        else buf.position(buf.position() + size)
      }
      require(dataLen >= 0, s"no data chunk in doc $id")
      (id, "wav", dataLen)
    } else if (ascii(0, 2) == "BM") {
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.position(18)
      val width = buf.getInt; val height = buf.getInt
      val stride = ((width + 3) / 4) * 4
      (id, "bmp", stride.toLong * height)
    } else if (ascii(0, 9) == "YUV4MPEG2") {
      var pos = 0
      while (bytes(pos) != '\n'.toByte) pos += 1
      pos += 1
      var frames = 0L
      while (pos < bytes.length) {
        require(ascii(pos, 6) == "FRAME\n", s"bad frame mark in doc $id")
        pos += 6 + FrameBytes
        frames += 1
      }
      (id, "y4m", frames * FrameBytes)
    } else (id, "unknown", 0L)
  }

  val mm_container_probe_sql: String =
    s"""SELECT doc_id,
       |  CASE doc_id % 3 WHEN 0 THEN 'wav' WHEN 1 THEN 'bmp' ELSE 'y4m' END AS container,
       |  CAST(CASE doc_id % 3
       |    WHEN 0 THEN length(text)
       |    WHEN 1 THEN (16 + (doc_id % 16) * 4) *
       |      greatest(1, (length(text) + (16 + (doc_id % 16) * 4) - 1) // (16 + (doc_id % 16) * 4))
       |    ELSE $FrameBytes * greatest(1, (length(text) + ${FrameBytes - 1}) // $FrameBytes)
       |  END AS BIGINT) AS payload_bytes
       |FROM documents""".stripMargin

  /** Audio RESAMPLE — the sample-rate normalization step of an audio
    * pipeline (every clip to one target rate before featurization), the
    * audio twin of [[mm_resize]]: parse the RIFF container, then map the
    * u8 PCM data chunk to [[TargetRate]] Hz with the standard
    * nearest-neighbor grid `src = (dst · srcN) / dstN` in integer
    * arithmetic. Emitted features — resampled length, sample sum, and a
    * position-weighted checksum (Σ (i+1)·sample_i) — pin every sampled
    * byte's VALUE and POSITION, so the oracle (recomputing the grid from
    * the text column) catches any off-by-one in the chunk walk or the
    * sampling map. Pure map over the binary column, no shuffle. */
  private val TargetRate = 4000

  def mm_audio_resample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { batch =>
      batch.map { case (id, textBytes) =>
        requireAscii(id, textBytes)
        val wav = synthesizeWav(sampleRateFor(id), textBytes)
        parseWavResample(id, wav)
      }
    }.toDF("doc_id", "out_samples", "sample_sum", "pos_checksum")
  }

  /** Walk the RIFF chunks to the data payload, then fold the resampled
    * grid; the source rate comes from the fmt chunk, not the synthesizer. */
  private[operators] def parseWavResample(id: Long, bytes: Array[Byte]): (Long, Long, Long, Long) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def magic(expect: String): Unit = {
      val got = new Array[Byte](4); buf.get(got)
      require(new String(got, "US-ASCII") == expect, s"bad magic in doc $id: expected $expect")
    }
    magic("RIFF"); buf.getInt; magic("WAVE")
    var sampleRate = 0
    var dataOff = -1; var nSamples = 0
    while (buf.remaining() >= 8) {
      val tag = new Array[Byte](4); buf.get(tag)
      val size = buf.getInt
      new String(tag, "US-ASCII") match {
        case "fmt " =>
          val fmtEnd = buf.position() + size
          require(buf.getShort == 1, s"not PCM in doc $id")
          buf.getShort // mono
          sampleRate = buf.getInt
          buf.position(fmtEnd)
        case "data" =>
          dataOff = buf.position(); nSamples = size
          buf.position(buf.position() + size)
        case _ => buf.position(buf.position() + size)
      }
    }
    require(dataOff >= 0 && sampleRate > 0, s"missing fmt/data chunk in doc $id")
    val outN = math.max(1L, nSamples.toLong * TargetRate / sampleRate)
    var i = 0L; var sum = 0L; var chk = 0L
    while (i < outN) {
      val src = (i * nSamples / outN).toInt
      val v = bytes(dataOff + src) & 0xff
      sum += v; chk += (i + 1) * v
      i += 1
    }
    (id, outN, sum, chk)
  }

  val mm_audio_resample_sql: String =
    s"""WITH g AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
       |      CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS rate FROM documents),
       |p AS (SELECT doc_id, text, n, greatest(1, (n * $TargetRate) // rate) AS outn FROM g),
       |r AS (SELECT doc_id, outn,
       |    list_transform(range(0, outn), i ->
       |      ord(substr(text, CAST((i * n) // outn + 1 AS INT), 1))) AS smp
       |  FROM p)
       |SELECT doc_id, outn AS out_samples,
       |  CAST(COALESCE(list_sum(smp), 0) AS BIGINT) AS sample_sum,
       |  CAST(COALESCE(list_sum(list_transform(range(1, CAST(outn AS INT) + 1),
       |    i -> i * smp[i])), 0) AS BIGINT) AS pos_checksum
       |FROM r""".stripMargin

  /** CORRUPT-BLOB QUARANTINE — error containment as DATA, not job failure:
    * at 100 TB some blobs are always truncated or bit-rotted, and one bad
    * object must never kill the job (PERMISSIVE mode for binary columns,
    * the blob twin of [[graft.sources.SourceFormats.src_malformed]]). A
    * deterministic tenth of the corpus (doc_id % 10 == 3) is corrupted at
    * the container magic before parsing; the parser runs under a catch and
    * emits a STATUS row either way — parsed sample count for good blobs,
    * `corrupt_magic` + a -1 sentinel for quarantined ones — so bad objects
    * flow to a quarantine table for re-fetch instead of throwing. Pure map,
    * no shuffle; the gate pins that exactly the corrupted set (and nothing
    * else) is quarantined and every good blob still parses to its exact
    * sample count. */
  def mm_quarantine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { batch =>
      batch.map { case (id, textBytes) =>
        requireAscii(id, textBytes)
        val wav = synthesizeWav(sampleRateFor(id), textBytes)
        if (id % 10 == 3) wav(0) = 'X'.toByte // simulated bit rot at the magic
        scala.util.Try(parseWav(id, wav)) match {
          case scala.util.Success((_, _, _, _, nSamples, _, _)) =>
            (id, "ok", nSamples)
          case scala.util.Failure(_) =>
            (id, "corrupt_magic", -1L)
        }
      }
    }.toDF("doc_id", "status", "n_samples")
  }

  val mm_quarantine_sql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 10 = 3 THEN 'corrupt_magic' ELSE 'ok' END AS status,
      |  CAST(CASE WHEN doc_id % 10 = 3 THEN -1 ELSE length(text) END AS BIGINT) AS n_samples
      |FROM documents""".stripMargin

  /** IMAGE NEAR-DUP pairs — the multimodal twin of [[Dedup.dedup_simhash]]:
    * same-dimension images whose [[mm_phash]] difference hashes are within
    * Hamming distance 3, found by LSH banding FOR HAMMING SPACE: the 60-bit
    * hash splits into 4 bands of 15 bits, and by pigeonhole any pair with
    * d ≤ 3 agrees exactly on ≥ 1 band — so joining on
    * (width, height, band_idx, band_value) is EXACT for the threshold while
    * only comparing candidates that share a bucket (680 candidates vs 125k
    * all-pairs at sf0.01). The dims in the key reflect the semantics (a
    * near-dup image has the same shape) and keep degenerate bands — short
    * images zero out high bands — from collapsing into one bucket. Scale:
    * bucket sizes are data-bounded like the text-side LSH joins; distance
    * evaluation is one codegen'd `bit_count(xor)` per candidate. */
  def mm_phash_dedup(s: SparkSession, dir: String): DataFrame = {
    val p = mm_phash(s, dir).select(col("doc_id"), col("width"), col("height"), col("phash"))
    val b = p.withColumn("bi", explode(array((0 to 3).map(lit(_)): _*)))
      .withColumn("bv", expr("(phash >> (bi * 15)) & 32767"))
    val left = b.select(col("doc_id").as("doc_id_a"), col("width"), col("height"),
      col("bi"), col("bv"), col("phash").as("ph_a"))
    val right = b.select(col("doc_id").as("doc_id_b"), col("width"), col("height"),
      col("bi"), col("bv"), col("phash").as("ph_b"))
    left.join(right, Seq("width", "height", "bi", "bv"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        expr("CAST(bit_count(ph_a ^ ph_b) AS INT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  val mm_phash_dedup_sql: String = {
    // the mm_phash oracle CTE, reused verbatim as the hash definition
    val phashCte = mm_phash_sql.substring(0, mm_phash_sql.indexOf("SELECT doc_id, CAST(w AS INT)"))
    phashCte +
      """, b AS (SELECT doc_id, w, h, phash, unnest([0,1,2,3]) AS bi FROM p),
        |bb AS (SELECT doc_id, w, h, phash, bi, (phash >> (bi*15)) & 32767 AS bv FROM b),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, c.doc_id AS doc_id_b,
        |    CAST(bit_count(xor(a.phash::BITSTRING, c.phash::BITSTRING)) AS INT) AS hamming
        |  FROM bb a JOIN bb c
        |    ON a.w = c.w AND a.h = c.h AND a.bi = c.bi AND a.bv = c.bv
        |   AND a.doc_id < c.doc_id)
        |SELECT doc_id_a, doc_id_b, hamming FROM cand WHERE hamming <= 3""".stripMargin
  }

  /** AUDIO NEAR-DUP pairs — [[mm_phash_dedup]]'s twin in the audio domain,
    * completing the near-dup join for all three modalities (image/audio/
    * video): same-window-count clips whose window-energy difference hashes
    * are within Hamming distance 3, found by the same pigeonhole-exact
    * Hamming banding (4 bands × 15 bits — any pair with d ≤ 3 agrees on
    * ≥ 1 band, so the (n_windows, band, value) bucket join is exact for
    * the threshold while never comparing non-candidates). The dedup
    * fingerprint uses a FINER window ([[AudioDedupWin]] samples) than the
    * [[mm_audio_fp]] profile: at the fixture's clip lengths the 64-sample
    * profile yields ≤9 hash bits — degenerate for a d≤3 threshold (nearly
    * everything matches) — while 8-sample windows give 12–60 informative
    * bits (measured: 86 true near-pairs vs 13.7k degenerate ones).
    * `n_windows` plays the role image dims play in the pHash join: a
    * near-dup clip has the same duration profile, and it keeps short
    * clips' zeroed high bands from collapsing into one bucket. Scale: the
    * fingerprint pass is a pure map (one RIFF parse per blob); the band
    * join shuffles 4 rows per clip of three integers. */
  private val AudioDedupWin = 8

  def mm_audio_dedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
    val p = ds.mapPartitions { batch =>
      batch.map { case (id, textBytes) =>
        requireAscii(id, textBytes)
        val wav = synthesizeWav(sampleRateFor(id), textBytes)
        parseWavFingerprint(id, wav, AudioDedupWin)
      }
    }.toDF("doc_id", "n_samples", "n_windows", "afp", "band16")
      .select(col("doc_id"), col("n_windows"), col("afp"))
    val b = p.withColumn("bi", explode(array((0 to 3).map(lit(_)): _*)))
      .withColumn("bv", expr("(afp >> (bi * 15)) & 32767"))
    val left = b.select(col("doc_id").as("doc_id_a"), col("n_windows"),
      col("bi"), col("bv"), col("afp").as("fp_a"))
    val right = b.select(col("doc_id").as("doc_id_b"), col("n_windows"),
      col("bi"), col("bv"), col("afp").as("fp_b"))
    left.join(right, Seq("n_windows", "bi", "bv"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        expr("CAST(bit_count(fp_a ^ fp_b) AS INT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  val mm_audio_dedup_sql: String =
    s"""WITH g AS (SELECT doc_id, text, length(text) AS len,
       |        greatest(1, (length(text) + ${AudioDedupWin - 1}) // $AudioDedupWin) AS nw
       |      FROM documents),
       |fp AS MATERIALIZED (SELECT doc_id, nw AS n_windows,
       |   CAST(COALESCE(list_sum(list_transform(range(0, least(nw - 1, 60)), w ->
       |     CASE WHEN
       |       COALESCE(list_sum(list_transform(range(w*$AudioDedupWin + 1, w*$AudioDedupWin + ${AudioDedupWin + 1}), i ->
       |         CASE WHEN i <= len THEN ord(substr(text, CAST(i AS INT), 1)) ELSE 0 END)), 0)
       |       >
       |       COALESCE(list_sum(list_transform(range((w+1)*$AudioDedupWin + 1, (w+1)*$AudioDedupWin + ${AudioDedupWin + 1}), i ->
       |         CASE WHEN i <= len THEN ord(substr(text, CAST(i AS INT), 1)) ELSE 0 END)), 0)
       |     THEN (CAST(1 AS BIGINT) << CAST(w AS INT)) ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS afp
       | FROM g),
       |b AS (SELECT doc_id, n_windows, afp, unnest([0,1,2,3]) AS bi FROM fp),
       |bb AS (SELECT doc_id, n_windows, afp, bi, (afp >> (bi*15)) & 32767 AS bv FROM b),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_id_a, c.doc_id AS doc_id_b,
       |    CAST(bit_count(xor(a.afp::BITSTRING, c.afp::BITSTRING)) AS INT) AS hamming
       |  FROM bb a JOIN bb c
       |    ON a.n_windows = c.n_windows AND a.bi = c.bi AND a.bv = c.bv
       |   AND a.doc_id < c.doc_id)
       |SELECT doc_id_a, doc_id_b, hamming FROM cand WHERE hamming <= 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_audio_dedup" -> mm_audio_dedup _,
    "mm_video_dedup" -> mm_video_dedup _,
    "mm_phash_dedup" -> mm_phash_dedup _,
    "mm_audio_resample" -> mm_audio_resample _,
    "mm_quarantine" -> mm_quarantine _,
    "mm_container_probe" -> mm_container_probe _,
    "mm_silence_detect" -> mm_silence_detect _,
    "mm_scene_cut" -> mm_scene_cut _,
    "mm_metadata" -> mm_metadata _,
    "mm_features" -> mm_features _,
    "mm_image_meta" -> mm_image_meta _,
    "mm_frame_sample" -> mm_frame_sample _,
    "mm_phash" -> mm_phash _,
    "mm_image_decode" -> mm_image_decode _,
    "mm_audio_fp" -> mm_audio_fp _,
    "mm_resize" -> mm_resize _,
  )

  val oracles: Map[String, String] = Map(
    "mm_audio_dedup" -> mm_audio_dedup_sql,
    "mm_video_dedup" -> mm_video_dedup_sql,
    "mm_phash_dedup" -> mm_phash_dedup_sql,
    "mm_audio_resample" -> mm_audio_resample_sql,
    "mm_quarantine" -> mm_quarantine_sql,
    "mm_container_probe" -> mm_container_probe_sql,
    "mm_silence_detect" -> mm_silence_detect_sql,
    "mm_scene_cut" -> mm_scene_cut_sql,
    "mm_metadata" -> mm_metadata_sql,
    "mm_features" -> mm_features_sql,
    "mm_image_meta" -> mm_image_meta_sql,
    "mm_frame_sample" -> mm_frame_sample_sql,
    "mm_phash" -> mm_phash_sql,
    "mm_image_decode" -> mm_image_decode_sql,
    "mm_audio_fp" -> mm_audio_fp_sql,
    "mm_resize" -> mm_resize_sql,
  )
}

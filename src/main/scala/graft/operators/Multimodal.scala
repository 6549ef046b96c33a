package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.3): media payloads are opaque
  * `binary` columns with a typed metadata struct, processed in partition-
  * sized batches.
  *
  * The IMAGE path (`mm02`) is a real codec round trip: payloads are
  * grayscale PNGs (synthesized deterministically from document bytes,
  * encoded with `javax.imageio` — the JDK's own codec, headless-safe) and
  * the decode step is a genuine `ImageIO.read` producing decoded width /
  * height / pixel statistics. The oracle checks exactly those DECODED
  * properties, which are pure functions of the source text, so a DuckDB
  * query can predict them without a PNG codec. The VIDEO frame path
  * (`mm03`) keeps a clearly-marked byte-arithmetic STUB for the
  * decode+resize step — no pure-JVM video codec exists in this container —
  * while its batch fan-out plumbing is real and oracle-gated.
  */
object Multimodal {

  /** Typed result of the PNG decoder — decoded properties only. */
  case class MediaFeatures(doc_id: Long, width: Int, height: Int, pix_sum: Long)

  /** Typed result of the (stubbed) frame sampler. */
  case class Frame(doc_id: Long, source: String, frame_idx: Int, thumb: Long)

  /** Typed result of the WAV decoder — decoded properties only. */
  case class AudioFeatures(doc_id: Long, sample_rate: Int, n_samples: Long,
      sample_sum: Long, peak: Int)

  /** Synthesize a real PCM WAV clip from content bytes: 8-bit unsigned
    * mono at 8 kHz, samples are the content bytes repeated cyclically to
    * a length derived from the byte count. Encoded with
    * `javax.sound.sampled.AudioSystem` — the JDK's own codec. */
  private[graft] def encodeWav(content: Array[Byte]): Array[Byte] = {
    val n = content.length
    val k = (n % 2000) + 100
    val pcm = new Array[Byte](k)
    var i = 0
    while (i < k) { pcm(i) = if (n > 0) content(i % n) else 0; i += 1 }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, k.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL decode: parse the WAV container, read the PCM frames back and
    * extract decoded sample statistics. */
  private[graft] def decodeWav(docId: Long, payload: Array[Byte]): AudioFeatures = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    val buf = ais.readAllBytes()
    var sum = 0L
    var peak = 0
    var i = 0
    while (i < buf.length) {
      val v = buf(i) & 0xff
      sum += v
      if (v > peak) peak = v
      i += 1
    }
    AudioFeatures(docId, fmt.getSampleRate.toInt, buf.length.toLong, sum, peak)
  }

  /** Synthesize a real grayscale PNG from content bytes: dimensions are a
    * deterministic function of the byte count, pixels are the content
    * bytes written row-major and repeated cyclically. ASCII fixtures give
    * sample values 0-127, which 8-bit gray PNG round-trips losslessly. */
  private[graft] def encodePng(content: Array[Byte]): Array[Byte] = {
    val n = content.length
    val w = (n % 64) + 1
    val h = (n % 48) + 2
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, if (n > 0) content(i % n) & 0xff else 0)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL decode: `ImageIO.read` the PNG payload and extract decoded
    * metadata + a pixel checksum. Runs on executors inside the
    * `mapPartitions` batch (headless JVM — no display needed). */
  private[graft] def decodePng(docId: Long, payload: Array[Byte]): MediaFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    MediaFeatures(docId, w, h, sum)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + metadata struct round trip: text → utf-8 bytes as
    // the opaque payload, content hash + size as metadata; per-source stats.
    "mm01_binary_metadata" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .select(col("source"),
          col("text").cast("binary").as("payload"))
        .select(col("source"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("content_hash"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("total_bytes"),
          countDistinct(col("content_hash")).as("n_distinct"),
          max(col("n_bytes")).as("max_bytes"))
    }),

    // mapPartitions feature extraction over binary payloads — the batch
    // shape a pandas-UDF/mapInPandas pipeline would use, with typed output
    // Encoders. Two real codec stages: synthesize a grayscale PNG per doc
    // (javax.imageio encode), then ImageIO.read it back and extract the
    // DECODED width/height/pixel checksum. The oracle predicts exactly the
    // decoded properties (pure functions of the text), so a hash-exact
    // DuckDB check gates a genuine image decode.
    "mm02_feature_extract" -> ((s, d) => {
      import s.implicits._
      val src = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("raw"))
      val media = src.as[(Long, Array[Byte])].mapPartitions { batch =>
        batch.map { case (id, content) => (id, encodePng(content)) }
      }.toDF("doc_id", "payload")
      val features = media.as[(Long, Array[Byte])].mapPartitions { batch =>
        batch.map { case (id, payload) => decodePng(id, payload) }
      }
      features.toDF()
        .groupBy((col("pix_sum") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("pix_sum")).as("sum_pix"),
          min(col("width")).as("min_width"),
          max(col("height")).as("max_height"))
    }),

    // The AUDIO path: same two-stage real-codec shape as mm02 — synthesize
    // a PCM WAV clip per doc (AudioSystem encode), decode it back through
    // the WAV parser, and roll up DECODED properties (sample rate, frame
    // count, amplitude sum/peak) per source. The oracle predicts those
    // from the text alone.
    "mm04_audio_features" -> ((s, d) => {
      import s.implicits._
      val src = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("text").cast("binary").as("raw"))
      val media = src.as[(Long, String, Array[Byte])].mapPartitions { batch =>
        batch.map { case (id, source, content) => (id, source, encodeWav(content)) }
      }.toDF("doc_id", "source", "payload")
      val features = media.as[(Long, String, Array[Byte])].mapPartitions { batch =>
        batch.map { case (id, source, payload) => (source, decodeWav(id, payload)) }
      }.toDF("source", "f")
      features.select(col("source"), col("f.*"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_clips"),
          min(col("sample_rate")).as("min_rate"),
          sum(col("n_samples")).as("total_samples"),
          sum(col("sample_sum")).as("total_amplitude"),
          max(col("peak")).as("max_peak"))
    }),

    // Frame sampling: each payload is treated as a media stream of 64-byte
    // frames; every 4th frame is sampled and "resized" to a thumbnail (a
    // byte-sum stub — a real pipeline would decode + downscale pixels
    // here). One input row fans out to many frame rows inside the same
    // mapPartitions batch (the flatMap/UDTF batch shape of a mapInPandas
    // frame extractor), then a per-source rollup.
    "mm03_frame_sample" -> ((s, d) => {
      import s.implicits._
      val src = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("text").cast("binary").as("payload"))
      val frames = src.as[(Long, String, Array[Byte])].mapPartitions { batch =>
        batch.flatMap { case (id, source, payload) =>
          val nFrames = payload.length / 64
          (0 until nFrames by 4).iterator.map { f =>
            var sum = 0L
            var i = f * 64
            val end = i + 64
            while (i < end) { sum += payload(i) & 0xff; i += 1 }
            Frame(id, source, f, sum % 256) // ??? stand-in for decode+resize
          }
        }
      }
      frames.toDF().groupBy(col("source"))
        .agg(count(lit(1)).as("n_frames_sampled"),
          countDistinct(col("doc_id")).as("n_docs_with_frames"),
          sum(col("thumb")).as("sum_thumbs"),
          max(col("thumb")).as("max_thumb"))
    })
  )

  val oracles: Map[String, String] = Map(
    "mm01_binary_metadata" -> """
      SELECT source, COUNT(*) AS n_media,
             CAST(SUM(OCTET_LENGTH(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
             COUNT(DISTINCT md5(text)) AS n_distinct,
             MAX(OCTET_LENGTH(CAST(text AS BLOB))) AS max_bytes
      FROM documents
      GROUP BY source""",

    // decoded-WAV properties predicted from the text: k = (n % 2000) + 100
    // samples of the content bytes repeated cyclically at 8 kHz
    "mm04_audio_features" -> """
      WITH g AS (
        SELECT doc_id, source, text,
               OCTET_LENGTH(CAST(text AS BLOB)) AS n,
               (OCTET_LENGTH(CAST(text AS BLOB)) % 2000) + 100 AS k
        FROM documents),
      f AS (
        SELECT doc_id, source, k,
               CASE WHEN n = 0 THEN 0 ELSE
                 LIST_SUM(LIST_TRANSFORM(RANGE(0, k),
                   i -> ORD(SUBSTRING(text, (i % n) + 1, 1)))) END AS sample_sum,
               CASE WHEN n = 0 THEN 0 ELSE
                 LIST_MAX(LIST_TRANSFORM(RANGE(0, LEAST(k, n)),
                   i -> ORD(SUBSTRING(text, i + 1, 1)))) END AS peak
        FROM g)
      SELECT source, COUNT(*) AS n_clips,
             8000 AS min_rate,
             CAST(SUM(k) AS BIGINT) AS total_samples,
             CAST(SUM(sample_sum) AS BIGINT) AS total_amplitude,
             CAST(MAX(peak) AS INT) AS max_peak
      FROM f
      GROUP BY source""",

    "mm03_frame_sample" -> """
      WITH fr AS (
        SELECT doc_id, source,
               CAST(LIST_SUM(LIST_TRANSFORM(RANGE(u.f*64+1, u.f*64+65),
                 i -> ORD(SUBSTRING(text, i, 1)))) % 256 AS BIGINT) AS thumb
        FROM documents,
             LATERAL (SELECT UNNEST(RANGE(0, LENGTH(text)//64)) AS f) u
        WHERE u.f % 4 = 0)
      SELECT source, COUNT(*) AS n_frames_sampled,
             COUNT(DISTINCT doc_id) AS n_docs_with_frames,
             CAST(SUM(thumb) AS BIGINT) AS sum_thumbs,
             MAX(thumb) AS max_thumb
      FROM fr GROUP BY source""",

    // the oracle predicts the DECODED properties of the synthesized PNG —
    // dims from the byte count, pixel sum from content bytes written
    // row-major and repeated cyclically (fixture text is ASCII:
    // codepoint == byte value == gray sample)
    "mm02_feature_extract" -> """
      WITH g AS (
        SELECT doc_id, text,
               OCTET_LENGTH(CAST(text AS BLOB)) AS n,
               (OCTET_LENGTH(CAST(text AS BLOB)) % 64) + 1 AS w,
               (OCTET_LENGTH(CAST(text AS BLOB)) % 48) + 2 AS h
        FROM documents),
           p AS (
        SELECT doc_id, w, h,
               CASE WHEN n = 0 THEN 0 ELSE
                 LIST_SUM(LIST_TRANSFORM(RANGE(0, w * h),
                   i -> ORD(SUBSTRING(text, (i % n) + 1, 1)))) END AS pix_sum
        FROM g)
      SELECT CAST(pix_sum % 10 AS BIGINT) AS bucket, COUNT(*) AS n_media,
             CAST(SUM(pix_sum) AS BIGINT) AS sum_pix,
             MIN(w) AS min_width,
             MAX(h) AS max_height
      FROM p
      GROUP BY 1"""
  )
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.3): media payloads are opaque
  * `binary` columns with a typed metadata struct, processed in partition-
  * sized batches.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (`fakeDecode`) — what is real and
  * tested is the Spark-side plumbing: binary schema, metadata extraction,
  * `mapPartitions` batch shape (the Scala analogue of `mapInPandas`), and
  * partition-parallel feature extraction with an explicit output schema.
  */
object Multimodal {

  /** Typed result of the (stubbed) decoder. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, first_byte: Int,
      last_byte: Int, byte_sum_mod: Long, width: Int, height: Int)

  /** Typed result of the (stubbed) frame sampler. */
  case class Frame(doc_id: Long, source: String, frame_idx: Int, thumb: Long)

  /** STUB decoder: a real pipeline would decode image bytes here (e.g.
    * JPEG → pixels). Deterministic fake: "dimensions" derived from content
    * bytes so downstream grouping/joining behaves like real metadata. */
  private def fakeDecode(docId: Long, payload: Array[Byte]): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      sum += payload(i) & 0xff
      i += 1
    }
    val n = payload.length
    MediaFeatures(
      doc_id = docId,
      n_bytes = n,
      first_byte = if (n > 0) payload(0) & 0xff else -1,
      last_byte = if (n > 0) payload(n - 1) & 0xff else -1,
      byte_sum_mod = sum % 1000,
      width = (sum % 640).toInt + 1,   // ??? stand-in for decoded width
      height = (sum % 480).toInt + 1)  // ??? stand-in for decoded height
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
    // shape a pandas-UDF/mapInPandas pipeline would use, with a typed
    // output Encoder. The decode itself is the deterministic stub above.
    "mm02_feature_extract" -> ((s, d) => {
      import s.implicits._
      val src = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      val features = src.as[(Long, Array[Byte])].mapPartitions { batch =>
        batch.map { case (id, payload) => fakeDecode(id, payload) }
      }
      features.toDF()
        .groupBy((col("byte_sum_mod") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("sum_bytes"),
          min(col("width")).as("min_width"),
          max(col("height")).as("max_height"))
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

    // the stub decoder is pure byte arithmetic, so the oracle can mirror
    // it (fixture text is ASCII: codepoint == byte value)
    "mm02_feature_extract" -> """
      WITH f AS (
        SELECT doc_id,
               OCTET_LENGTH(CAST(text AS BLOB)) AS n_bytes,
               LIST_SUM(LIST_TRANSFORM(
                 RANGE(1, LENGTH(text) + 1),
                 i -> ORD(SUBSTRING(text, i, 1)))) AS byte_sum
        FROM documents),
           g AS (
        SELECT doc_id, n_bytes,
               CAST(byte_sum % 1000 AS BIGINT) AS byte_sum_mod,
               CAST((byte_sum % 640) + 1 AS BIGINT) AS width,
               CAST((byte_sum % 480) + 1 AS BIGINT) AS height
        FROM f)
      SELECT byte_sum_mod % 10 AS bucket, COUNT(*) AS n_media,
             CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
             MIN(width) AS min_width,
             MAX(height) AS max_height
      FROM g
      GROUP BY 1"""
  )
}

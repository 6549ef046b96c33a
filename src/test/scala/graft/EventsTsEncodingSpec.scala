package graft

import java.nio.file.Files
import java.time.{Instant, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Regression for the r8 fixture-regen break (VERDICT r8 item 1): the
  * events fixture's `ts` column has shipped under three different physical
  * encodings across test-data generations — TIMESTAMP(NANOS) (read as a
  * nanos long under `spark.sql.legacy.parquet.nanosAsLong=true`),
  * timestamp[us] without tz (read as TIMESTAMP_NTZ), and plain TIMESTAMP.
  * Every read site must route through `Tables.normalizeEventsTs`, and that
  * normalizer must map all three encodings of the same instant to the SAME
  * TimestampType value — for the batch loader AND for a watermarked
  * streaming read (the path that crashed with
  * EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE when streamEvents kept its own
  * single-arm copy of the conversion). */
class EventsTsEncodingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    org.apache.spark.shuffle.cloud.CloudShuffleEnv.reset()
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("events-ts-encoding-spec")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // two instants an hour apart, micro-precision tail to catch truncation
  private val i1 = Instant.parse("2024-03-01T10:15:30.123456Z")
  private val i2 = Instant.parse("2024-03-01T11:15:30.654321Z")
  private def us(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  /** Write a 2-row events-shaped fixture with `ts` under the given
    * encoding; returns the fixture dir (file named events.parquet so the
    * streaming glob matches). */
  private def writeFixture(enc: String): String = {
    val dir = Files.createTempDirectory(s"graft-tsenc-$enc")
    val (tsType, v1, v2): (DataType, Any, Any) = enc match {
      case "nanos-long" => (LongType, us(i1) * 1000L, us(i2) * 1000L)
      case "ntz" => (TimestampNTZType,
        LocalDateTime.ofInstant(i1, ZoneOffset.UTC),
        LocalDateTime.ofInstant(i2, ZoneOffset.UTC))
      case "ltz" => (TimestampType,
        java.sql.Timestamp.from(i1), java.sql.Timestamp.from(i2))
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val rows = java.util.Arrays.asList(
      Row(1L, v1, 7L, "click", 1.5), Row(2L, v2, 7L, "purchase", 2.5))
    val df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("overwrite").parquet(dir.resolve("out").toString)
    val listing = Files.list(dir.resolve("out"))
    val part = try listing.filter(p =>
      p.getFileName.toString.startsWith("part-")).findFirst().get()
    finally listing.close()
    Files.move(part, dir.resolve("events.parquet"))
    org.apache.commons.io.FileUtils.deleteQuietly(dir.resolve("out").toFile)
    dir.toString
  }

  private val encodings = Seq("nanos-long", "ntz", "ltz")

  test("batch load normalizes all three ts encodings to the same instants") {
    for (enc <- encodings) {
      val dir = writeFixture(enc)
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"$enc: expected TIMESTAMP after normalize, got ${df.schema("ts").dataType}")
      val got = df.orderBy("event_id")
        .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
      assert(got == Seq(us(i1), us(i2)), s"$enc: micros mismatch: $got")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("watermarked streaming read drains under all three ts encodings") {
    for (enc <- encodings) {
      val dir = writeFixture(enc)
      val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
      val src = Tables.normalizeEventsTs(spark.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      val agg = src.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val name = "tsenc_" + enc.replace("-", "_")
      val ckpt = Files.createTempDirectory(s"graft-tsenc-ckpt-$enc")
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val rows = spark.table(name)
        .select(unix_micros(col("window.start")), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val hourUs = 3600L * 1000000L
      assert(rows == Set(
        (us(i1) / hourUs * hourUs, "click", 1L),
        (us(i2) / hourUs * hourUs, "purchase", 1L)),
        s"$enc: drained windows mismatch: $rows")
      spark.catalog.dropTempView(name)
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}

package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: does Spark 4.1 accept a non-time conjunct (a_id < b_id) in a
  * stream-stream interval join condition? (r2 found it throws; VERDICT r3
  * asks for a retry or a precisely cited negative result.) */
object StreamJoinProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val s = GraftSession.get("4")
    val rawSchema = s.read.parquet(s"$d/events.parquet").schema
    def ev = graft.Tables.normalizeEventsTs(s.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet").parquet(d))
    val a = ev.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("a_user"), col("event_id").as("a_id"), col("ts").as("a_ts"))
    val b = ev.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts").as("b_ts"))
    val joined = a.join(b,
      col("a_user") === col("b_user") &&
        col("a_id") < col("b_id") &&
        col("b_ts") >= col("a_ts") - expr("INTERVAL 1 HOUR") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
    try {
      val q = joined.writeStream.format("memory").queryName("sj_probe")
        .outputMode("append")
        .option("checkpointLocation", "/tmp/graft-sj-probe-" + System.nanoTime())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      println("[sjprobe] SUCCESS rows=" + s.table("sj_probe").count())
    } catch {
      case t: Throwable =>
        println("[sjprobe] FAILED: " + t.getClass.getName)
        var c = t.getCause
        while (c != null) {
          println("[sjprobe] cause: " + c.getClass.getName + ": " +
            c.getMessage.take(400))
          c = c.getCause
        }
    }
    s.stop()
  }
}

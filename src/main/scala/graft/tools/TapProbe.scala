package graft.tools

import graft.GraftSession
import org.apache.spark.shuffle.cloud.ShuffleMetricsTap

/** Regression probe for task-level shuffle READ metrics through the
  * plugin (r6): a repartition+sort round trip must report read bytes ==
  * write bytes. Before the CloudShuffleReader merge fix, reads flapped
  * between full and zero depending on whether an executor heartbeat
  * fired mid-task (temp read metrics were never folded into the task's
  * accumulators on completion). Run: sbt "runMain graft.tools.TapProbe"
  */
object TapProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("8")
    val tap = new ShuffleMetricsTap(spark.sparkContext)
    import org.apache.spark.sql.functions._
    for (i <- 1 to 3) {
      tap.harvest()
      val n = spark.range(2000000L).select(xxhash64(col("id")).as("k"))
        .repartitionByRange(16, col("k")).sortWithinPartitions(col("k")).count()
      val (w, r) = tap.harvest()
      println(s"TAPPROBE pass=$i n=$n w=$w r=$r")
      assert(r == w, s"shuffle reads under-reported: $r of $w")
    }
    spark.stop()
  }
}

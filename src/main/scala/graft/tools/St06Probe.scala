package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev utility: dump st06's drained left-outer join rows (pre-aggregation)
  * so missing outer emissions can be diffed against the batch join. */
object St06Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val spark = GraftSession.get()
    // one row per drained join output, so missing a_ids can be named
    val df = graft.operators.StreamingQueries.st06Drained(spark, sfDir)
      .select(col("a_id"), col("b_id"), col("a_ts"), col("b_ts"))
    df.coalesce(1).write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}

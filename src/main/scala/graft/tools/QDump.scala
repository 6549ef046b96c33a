package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev utility: dump one query's result to parquet for targeted oracle
  * checks. Usage: runMain graft.tools.QDump <sfDir> <outDir> <query...> */
object QDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val spark = GraftSession.get()
    args.drop(2).foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
    }
    spark.stop()
  }
}

package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev utility: dump one query's result to parquet for targeted oracle
  * checks, plus the queries' oracle_sql.json subset so
  * scripts/check_oracle.py runs directly on the dump dir (no full
  * Verify needed). Usage: runMain graft.tools.QDump <sfDir> <outDir> <query...> */
object QDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val spark = GraftSession.get()
    val names = args.drop(2)
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
    }
    graft.Verify.writeOracleJson(
      SparkEntry.oracleSql.view.filterKeys(names.contains).toMap,
      s"$outDir/oracle_sql.json")
    spark.stop()
  }
}

package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev utility: dump one query's result to parquet for targeted oracle
  * checks, plus the queries' oracle_sql.json subset so
  * scripts/check_oracle.py runs directly on the dump dir (no full
  * Verify needed). Usage: runMain graft.tools.QDump <sfDir> <outDir> <query...> */
object QDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: QDump <sfDir> <outDir> <query...>")
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    // a requested query without an oracle dumps fine but can't be
    // compared — say so loudly, or check_oracle.py's "0 pass / 0 fail"
    // on an all-no-oracle dump reads as green when nothing was checked
    names.filterNot(SparkEntry.oracleSql.contains).foreach(n =>
      System.err.println(s"[qdump] WARNING: $n has no oracle entry — " +
        "the dump is written but check_oracle.py will not compare it"))
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
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

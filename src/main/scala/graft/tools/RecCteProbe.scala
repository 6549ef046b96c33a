package graft.tools
import graft.GraftSession
object RecCteProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("4")
    try {
      val r = spark.sql(
        "WITH RECURSIVE t AS (SELECT 1 AS n UNION ALL SELECT n+1 FROM t WHERE n < 5) SELECT sum(n) AS s FROM t")
        .collect()(0).getLong(0)
      println(s"RECCTE sum=$r")
    } catch { case e: Exception => println(s"RECCTE unsupported: ${e.getMessage.take(200)}") }
    spark.stop()
  }
}

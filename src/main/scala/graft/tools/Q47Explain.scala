package graft.tools
import graft.{GraftSession, SparkEntry}
object Q47Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("8")
    val df = SparkEntry.queries("q47_recursive_cte")(spark, "/root/testdata/sf0.01")
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}

package graft.tools
import graft.{GraftSession, SparkEntry}
object Q47Time {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("32")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q47_recursive_cte")(spark, "/root/testdata/sf0.1").count()
      println(f"Q47TIME pass=$i rows=$n sec=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}

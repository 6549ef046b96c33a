package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev utility: print the formatted physical plan of queries.
  * Usage: runMain graft.tools.Explain <sfDir> <query1> [query2 ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.get("8")
    args.tail.foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

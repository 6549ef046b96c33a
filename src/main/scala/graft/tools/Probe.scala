package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev utility: time a subset of queries at a given sf dir.
  * Usage: runMain graft.tools.Probe <sfDir> <query1> [query2 ...] */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.get()
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}

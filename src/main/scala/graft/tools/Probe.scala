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
      // noop write, not count(): a stacked count() re-optimizes and can
      // delete the operator under test (see Bench)
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      // capture the wall BEFORE the row count — the count is a second
      // full execution and must not bill the probe (ADVICE r10)
      val sec = (System.nanoTime() - t0) / 1e9
      val n = df.count()
      println(f"[probe] $name%-28s $sec%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}

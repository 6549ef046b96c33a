package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev utility: print the formatted physical plan of any shipped query —
  * the .explain("formatted") loop the scale audits use (scan count,
  * ReusedExchange, PushedFilters, WholeStageCodegen spans). With -x the
  * query EXECUTES first (noop sink) and the FINAL adaptive plan prints —
  * the only view where AQE's runtime exchange reuse / stage replans are
  * visible (the pre-execution formatted plan duplicates every shared
  * subtree).
  * Usage: runMain graft.tools.Explain [-x] <sfDir> <query...> */
object Explain {
  def main(args: Array[String]): Unit = {
    val exec = args.headOption.contains("-x")
    val rest = if (exec) args.tail else args
    require(rest.length >= 2, "usage: Explain [-x] <sfDir> <query...>")
    val spark = GraftSession.get("8")
    rest.tail.foreach { name =>
      println(s"==== $name ====")
      val df = SparkEntry.queries(name)(spark, rest.head)
      if (exec) {
        // run the df's OWN QueryExecution — df.write/df.rdd/df.count all
        // plan a FRESH one and the printed AdaptiveSparkPlan would stay
        // isFinalPlan=false. collect() is the action that executes
        // `df.queryExecution` itself; dev probe only — don't point it at
        // a query with a large result set.
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}

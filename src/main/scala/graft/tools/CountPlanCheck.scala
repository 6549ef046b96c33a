package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev utility: show what a stacked `count()` action would actually
  * execute for a query — the optimized plan of `df.groupBy().count()`.
  * This is the probe that caught the bench-action bug (r10): Catalyst
  * re-optimizes the counted plan, and a final left join against a
  * unique-keyed aggregate with no filter (dd16/pp05's audit-table shape)
  * is ELIMINATED, so a `.count()`-based bench times a bare scan instead
  * of the operator. Bench/Probe/ScaleProbe therefore execute the query's
  * own plan via `df.write.format("noop")` (raw `queryExecution.toRdd`
  * intermittently deadlocks AQE's withFinalPlanUpdate — see Bench).
  * Run this on any new audit-shaped
  * query to see whether a count() would have lied about it.
  * Usage: runMain graft.tools.CountPlanCheck <sfDir> <query...> */
object CountPlanCheck {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CountPlanCheck <sfDir> <query...>")
    val spark = GraftSession.get("8")
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, args.head)
      println(s"==== $name: optimized plan of a stacked count() ====")
      println(df.groupBy().count().queryExecution.optimizedPlan.toString.take(3000))
    }
    spark.stop()
  }
}

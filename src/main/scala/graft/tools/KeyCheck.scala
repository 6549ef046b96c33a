package graft.tools
import graft.SparkEntry

/** Dev utility: assert no query-key collisions between operator modules
  * (a later module's map entry would silently shadow an earlier one in
  * the SparkEntry merge) and no oracle entries without a query. Derives
  * the module list from SparkEntry.modules so it cannot drift. */
object KeyCheck {
  def main(args: Array[String]): Unit = {
    val mods = SparkEntry.modules.map { case (name, (qs, _)) => name -> qs.keySet }
    val sum = mods.map(_._2.size).sum
    val merged = SparkEntry.queries.keySet.size
    println(s"[keycheck] per-module sum=$sum merged=$merged " +
      (if (sum == merged) "OK" else "COLLISION!"))
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    println(s"[keycheck] oracles without queries: $orphans")
    // the Bench exclusion rides the `_stream_` naming convention for
    // drains outside the StreamingQueries module — the module's own keys
    // must all follow it, or the convention has silently lapsed
    val offConvention = graft.operators.StreamingQueries.queries.keySet
      .filterNot(_.contains("_stream_"))
    println(s"[keycheck] streaming keys off the _stream_ convention: $offConvention")
    // every query must be accounted for: an oracle, or a standing
    // noOracleNotes entry explaining why none can exist (driver records
    // err="no_oracle" for those; the note is the documentation the
    // correctness report points at)
    val unaccounted = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- SparkEntry.noOracleNotes.keySet
    println(s"[keycheck] queries with neither oracle nor no-oracle note: $unaccounted")
    // scripted callers must see failure as failure, not a log line
    if (sum != merged || orphans.nonEmpty || offConvention.nonEmpty ||
      unaccounted.nonEmpty) sys.exit(1)
  }
}

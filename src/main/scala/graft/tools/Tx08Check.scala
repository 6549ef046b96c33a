package graft.tools

import graft.GraftSession

/** Dev-only: print tx08 rows for a cross-engine eyeball/compare. */
object Tx08Check {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.get()
    graft.SparkEntry.queries("tx08_common_token_density")(s, d)
      .collect().foreach(r => println(s"[tx08] ${r.mkString(" ")}"))
    s.stop()
  }
}

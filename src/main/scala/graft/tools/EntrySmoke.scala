package graft.tools
import graft.{GraftSession, SparkEntry}

/** Dev-only: mimic the driver's SparkEntry.entry smoke check (rows > 0). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get("4")
    val n = SparkEntry.entry(s).count()
    println(s"[entry-smoke] rows=$n")
    s.stop()
  }
}

package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev probe for the A/B overhead tail: run the same queries under the
  * plugin and the default manager (two contexts, one JVM — Bench's lane
  * switch), accumulating task-metric components so the overhead can be
  * attributed: shuffle write time, fetch wait time, executor run time,
  * GC time, task count. Usage:
  *   sbt "runMain graft.tools.OverheadProfile <sfDir> <q1> [q2 ...]"
  */
object OverheadProfile {

  private class Acc extends SparkListener {
    var tasks = 0L
    var runMs = 0L
    var gcMs = 0L
    var shufWriteMs = 0L
    var fetchWaitMs = 0L
    var deserMs = 0L
    var schedDelayProxyMs = 0L // wall attribution happens at the caller
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      val m = t.taskMetrics
      if (m != null) {
        tasks += 1
        runMs += m.executorRunTime
        gcMs += m.jvmGCTime
        shufWriteMs += m.shuffleWriteMetrics.writeTime / 1000000L
        fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
        deserMs += m.executorDeserializeTime
      }
    }
    def reset(): Unit = synchronized {
      tasks = 0; runMs = 0; gcMs = 0; shufWriteMs = 0; fetchWaitMs = 0; deserMs = 0
    }
    def line: String = synchronized {
      f"tasks=$tasks run=${runMs}ms gc=${gcMs}ms shufWrite=${shufWriteMs}ms " +
        f"fetchWait=${fetchWaitMs}ms deser=${deserMs}ms"
    }
  }

  private def lane(label: String, plugin: Boolean, sfDir: String,
      names: Seq[String]): Unit = {
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), plugin)
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    // warmup
    graft.Tables.load(spark, sfDir, "lineitem").groupBy("l_returnflag").count().count()
    for (name <- names) {
      // median-ish: 3 runs, report each
      for (i <- 1 to 3) {
        System.gc()
        acc.reset()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e6
        Thread.sleep(150) // listener bus drain
        println(f"[ovh] $label $name#$i wall=${wall}%.0fms ${acc.line}")
      }
    }
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("tx06_tfidf", "q42_unpivot", "q10_distinct_pairs")
    lane("plugin ", plugin = true, sfDir, names)
    lane("default", plugin = false, sfDir, names)
  }
}

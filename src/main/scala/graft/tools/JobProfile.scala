package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev probe (r15): per-JOB wall breakdown of a multi-action query — the
  * iterative operators (DBSCAN tail, star contraction, dd09's loop) are
  * billed per Spark action, and the bench median can't say which of the
  * ~30 jobs the seconds land in. Prints one line per job (submit→end wall,
  * stage/task counts) plus the gaps BETWEEN jobs (driver-side planning),
  * for the query's 2nd run (first run pays one-time memoized builds).
  * Usage: sbt "runMain graft.tools.JobProfile <sfDir> <query> [query...]"
  */
object JobProfile {

  private class JobAcc extends SparkListener {
    final case class Job(id: Int, start: Long, var end: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0)
    val jobs = new scala.collection.mutable.LinkedHashMap[Int, Job]
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      jobs(e.jobId) = Job(e.jobId, e.time)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.end = e.time)
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
      val sid = e.stageInfo.stageId
      // attribute to the most recent unfinished job (approximation fine
      // for a sequential driver loop)
      jobs.values.lastOption.foreach { j =>
        j.stages += 1; j.tasks += e.stageInfo.numTasks
      }
      val _ = sid
    }
    def reset(): Unit = synchronized { jobs.clear() }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <sfDir> <query...>")
    val sfDir = args.head
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val acc = new JobAcc
    spark.sparkContext.addSparkListener(acc)
    graft.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count().count() // warmup
    args.tail.foreach { name =>
      // pass 1 (unprofiled): one-time memoized builds ride here
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      System.gc()
      Thread.sleep(200)
      acc.reset()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300) // listener bus drain
      println(f"==== $name wall=${wall}%.0f ms ====")
      acc.synchronized {
        var prevEnd = 0L
        var jobSum = 0L
        var gapSum = 0L
        acc.jobs.values.foreach { j =>
          val dur = j.end - j.start
          val gap = if (prevEnd == 0) 0L else math.max(0L, j.start - prevEnd)
          jobSum += dur; gapSum += gap
          println(f"[job] ${j.id}%4d dur=${dur}%6d ms gap=${gap}%6d ms stages=${j.stages}%3d tasks=${j.tasks}%5d")
          prevEnd = j.end
        }
        println(f"[sum] jobs=${acc.jobs.size} jobMs=$jobSum gapMs=$gapSum wall=${wall}%.0f")
      }
    }
    spark.stop()
  }
}

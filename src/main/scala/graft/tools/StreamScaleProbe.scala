package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import graft.operators.StreamingQueries
import org.apache.spark.shuffle.cloud.ShuffleMetricsTap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decade-right scale probe for the STREAMING family (VERDICT r9 item 1):
  * st01–st10, pp02, dd14, ss09 have only ever run at sf0.01 — and
  * stateful shuffles are per-microbatch, the place cleanup/state cost
  * could go superlinear. Drives every streaming drain at sf0.01, sf0.1,
  * and a derived sf1 tier, recording wall seconds, shuffle bytes (tap
  * over the plugin-fed task metrics), microbatch count, and state-store
  * rows/bytes (StreamingQueryListener progress events).
  *
  * The sf1 tier replicates the sf0.1 events 10× with BOTH event_id and
  * user_id shifted — disjoint user populations, i.e. the LINEAR regime a
  * 10× larger stream actually is (10× traffic over 10× users). Shifting
  * only event_id would instead multiply per-user density 10× and drive
  * the stream-stream joins into their quadratic output regime — a real
  * stress, but a DIFFERENT claim, already measured by dd04's pair-list
  * tier. Documents replicate with doc_id shifted and text identical
  * (ScaleProbe's premise: a corpus where every page has 10 copies is the
  * regime the dedup front end exists for). Embeddings stay verbatim —
  * ss09's serve cost tracks its request batches and probe-pruned index
  * reads, not the event stream, so its sf1 row measures tier-invariance
  * rather than growth. All three tables are staged as single PLAIN files:
  * the file streaming source does not descend into directory-shaped
  * parquet outputs.
  *
  * Run: sbt "runMain graft.tools.StreamScaleProbe"
  */
object StreamScaleProbe {

  private val Src = "/root/testdata/sf0.1"
  private val Dst = "/tmp/graft-sf1-stream"

  private def rep10(df: DataFrame, keys: Seq[String], stride: Long): DataFrame =
    (0 until 10).map { i =>
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * stride)))
    }.reduce(_ unionAll _)

  /** Build (once) and return the derived sf1 streaming tier dir — also
    * the source of BenchStream's sf1 column. */
  private[graft] def ensureBuilt(s: SparkSession): String = {
    val done = new java.io.File(s"$Dst/_built")
    if (done.exists()) return Dst
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(Dst))
    val stride = 100000000L
    val t0 = System.currentTimeMillis()
    def stage(name: String, df: DataFrame): Unit =
      StreamingQueries.stageAsFile(df,
        java.nio.file.Paths.get(s"$Dst/$name.parquet"), t0)
    stage("events", rep10(Tables.load(s, Src, "events"),
      Seq("event_id", "user_id"), stride))
    stage("documents", rep10(Tables.load(s, Src, "documents"),
      Seq("doc_id"), stride))
    stage("embeddings", Tables.load(s, Src, "embeddings"))
    done.createNewFile()
    Dst
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val tap = new ShuffleMetricsTap(spark.sparkContext)
    ensureBuilt(spark)
    // per-query streaming progress census: microbatches seen, peak total
    // state rows and peak state memory across the drain's batches
    val lock = new Object
    var batches = 0
    var stateRowsMax = 0L
    var stateMemMax = 0L
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = lock.synchronized {
        batches += 1
        val ops = e.progress.stateOperators
        if (ops != null && ops.nonEmpty) {
          stateRowsMax = math.max(stateRowsMax, ops.map(_.numRowsTotal).sum)
          stateMemMax = math.max(stateMemMax, ops.map(_.memoryUsedBytes).sum)
        }
      }
    }
    spark.streams.addListener(listener)
    val queries = SparkEntry.queries.keys.filter(SparkEntry.streamingQueries)
      .toSeq.sorted
    for (dir <- Seq("/root/testdata/sf0.01", Src, Dst); name <- queries) {
      System.gc()
      lock.synchronized { batches = 0; stateRowsMax = 0L; stateMemMax = 0L }
      tap.harvest()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val (wb, rb) = tap.harvest()
      Thread.sleep(500) // listener bus is async; let the last events land
      val (nb, srm, smm) = lock.synchronized { (batches, stateRowsMax, stateMemMax) }
      println(f"STREAMSCALE $dir $name rows=$rows wall=$sec%.2f s " +
        f"shuffle_w=${wb / 1e6}%.1f MB shuffle_r=${rb / 1e6}%.1f MB " +
        f"batches=$nb state_rows_max=$srm state_mem_max=${smm / 1e6}%.1f MB")
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}

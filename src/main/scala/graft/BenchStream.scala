package graft

/** Streaming-drain benchmark (VERDICT r8 item 6): the st-family plus the
  * streaming drains living in other modules (pp02, dd14, ss09) are
  * excluded from Bench by design — an AvailableNow checkpointed drain
  * measures state-store + checkpoint I/O, not engine throughput, and would
  * swamp the batch medians. That made them invisible to perf tracking:
  * a dd15-style regression in a streaming query would surface nowhere.
  * This main gives them their own lane: median-of-3 interleaved drain
  * wall-times, same protocol and JSON contract as Bench (short ids,
  * ms precision, method marker, file copy at target/bench_stream.json).
  */
object BenchStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // warmup: session startup + FS metadata off the first query's bill
    Tables.load(spark, sfDir, "events").groupBy("event_type").count().count()
    // harness/query split (VERDICT r9 item 2): the sentineled source dir
    // (fixture copy + 2 staged sentinel files) is built once per fixture
    // and reused by every st06/st07/st08/st09 drain — bill it here, as its
    // own number, so the per-query medians measure the DRAIN (state store,
    // per-microbatch shuffle, checkpoint commits), not file staging.
    val tHarness0 = System.nanoTime()
    operators.StreamingQueries.sentineledSrcDir(spark, sfDir)
    val harnessSec = (System.nanoTime() - tHarness0) / 1e9
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => SparkEntry.streamingQueries.contains(name) }
    val passes = (1 to 3).map { _ =>
      ordered.map { case (name, fn) =>
        System.gc()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          name -> (System.nanoTime() - t0) / 1e9
        } catch {
          case t: Throwable =>
            System.err.println(s"BENCH_STREAM FAIL $name: ${t.getClass.getName}: ${t.getMessage}")
            name -> -1.0
        }
      }.toMap
    }
    def ms(v: Double): String = if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def short(name: String): String = name.takeWhile(_ != '_')
    require(ordered.map(n => short(n._1)).toSet.size == ordered.size,
      "shortened bench keys must stay unique")
    case class Stat(med: Double, min: Double, spread: Double)
    val results = ordered.map { case (name, _) =>
      val times = passes.map(_(name))
      name -> (if (times.exists(_ < 0)) Stat(-1.0, -1.0, 0.0)
               else {
                 val sorted = times.sorted
                 Stat(sorted(sorted.size / 2), sorted.head, sorted.last - sorted.head)
               })
    }
    val qs = results.sortBy(_._1)
      .map { case (k, v) => "\"" + short(k) + "\":" + ms(v.med) }
      .mkString("{", ",", "}")
    val detail = results.sortBy(_._1).map { case (k, v) =>
      "\"" + short(k) + "\":{\"med_s\":" + ms(v.med) + ",\"min_s\":" + ms(v.min) +
        ",\"spread_s\":" + ms(v.spread) + "}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2.med).filter(_ >= 0).sum
    // a silently-dropped failure would make the total look FASTER (ADVICE
    // r9): name the failed queries on the line so a smaller total over
    // fewer queries cannot read as an improvement
    val failed = results.collect { case (k, v) if v.med < 0 => "\"" + short(k) + "\"" }
      .mkString("[", ",", "]")
    // the sf1 column (VERDICT r9 item 1): one single-run pass over the
    // derived ×10 tier (tools.StreamScaleProbe's disjoint-user events
    // replication), so the committed snapshot carries the decade-step
    // next to the sf0.01 medians. SPARK_GRAFT_STREAM_SF1=0 skips it.
    val sf1Part = if (sys.env.getOrElse("SPARK_GRAFT_STREAM_SF1", "1") == "0") ""
      else {
        val dir1 = tools.StreamScaleProbe.ensureBuilt(spark)
        val col1 = ordered.map { case (name, fn) =>
          System.gc()
          val t0 = System.nanoTime()
          val sec = try { fn(spark, dir1).count(); (System.nanoTime() - t0) / 1e9 }
            catch { case t: Throwable =>
              System.err.println(s"BENCH_STREAM sf1 FAIL $name: ${t.getMessage}"); -1.0 }
          "\"" + short(name) + "\":" + ms(sec)
        }.mkString("{", ",", "}")
        s""","sf1_dir":"$dir1","queries_sf1":$col1"""
      }
    val line = s"""{"metric":"stream_total","value":${ms(total)},"unit":"sec","method":"median3","failed":$failed,"harness_prestage_s":${ms(harnessSec)},"queries":$qs,"sf":"$sfDir"$sf1Part,"detail":$detail}"""
    val out = java.nio.file.Paths.get("target/bench_stream.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(line)
  }
}

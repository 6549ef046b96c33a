package org.apache.spark.shuffle.cloud

import java.net.URI
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.hadoop.fs.{FileSystem, Path, FSDataInputStream, FSDataOutputStream}
import org.apache.spark.{SparkConf, SparkEnv}
import org.apache.spark.deploy.SparkHadoopUtil
import org.apache.spark.internal.Logging
import org.apache.spark.storage._

/** Process-wide configuration + Hadoop FileSystem handle for the cloud
  * shuffle plugin.
  *
  * Behavioral spec from the reference's dispatcher
  * (`helper/S3ShuffleDispatcher.scala:25-255`): a lazily-created singleton
  * holding the FS client, the deterministic object-store path scheme
  * `${rootDir}/${mapId % folderPrefixes}/${appId}/${shuffleId}/${blockId}`
  * (`:142-143`) — the prefix shard dodges per-prefix object-store rate
  * limits — plus parallel bulk deletes (`:104-118,174-183`) and
  * readahead suppression for ranged reads (`:194-196`). Re-expressed
  * from scratch for Spark 4.1.2.
  */
final class CloudShuffleEnv(val conf: SparkConf, val appId: String) extends Logging {

  import CloudShuffleEnv._

  /** Spark-native fetch mode: blocks are written in Spark's
    * FallbackStorage layout and read by Spark's own BlockStoreShuffleReader
    * through the fallback block manager (reference:
    * `S3ShuffleManager.scala:82-99`, `S3ShuffleDispatcher.scala:132-141`).
    * rootDir is then the decommission fallback path by definition. */
  val useSparkShuffleFetch: Boolean =
    conf.getBoolean(SPARK_FETCH_KEY, defaultValue = false)

  val rootDir: String = {
    val d =
      if (useSparkShuffleFetch)
        conf.getOption("spark.storage.decommission.fallbackStorage.path")
          .getOrElse(throw new IllegalArgumentException(
            s"$SPARK_FETCH_KEY requires spark.storage.decommission.fallbackStorage.path"))
      else conf.get(ROOT_DIR_KEY, "file:///tmp/cloud-shuffle")
    if (d.endsWith("/")) d.dropRight(1) else d
  }
  val folderPrefixes: Int = math.max(1, conf.getInt(PREFIXES_KEY, 10))
  // 1m default (r14, was 8m): the buffer only coalesces sub-buffer write()
  // calls before the FS client's own buffering (io.file.buffer.size /
  // the object-store client's multipart block store) — 1 MiB keeps that
  // protection while an 8 MiB array per concurrent map writer was pure
  // heap churn (tools/Ts01Profile: ~10% of ts01's plugin-lane wall on the
  // write side). Object-store PUT granularity lives in the FS client, not
  // here; raise per job if a store's client measures otherwise.
  val writeBufferSize: Int = conf.getSizeAsBytes(WRITE_BUFFER_KEY, "1m").toInt
  val readBufferSize: Int = conf.getSizeAsBytes(READ_BUFFER_KEY, "1m").toInt
  val maxBufferSizeTask: Long = conf.getSizeAsBytes(MAX_BUFFER_TASK_KEY, "128m")
  val maxConcurrencyTask: Int = math.max(1, conf.getInt(MAX_CONCURRENCY_KEY, 10))
  /** Executor-wide cap on concurrent prefetch reads across ALL tasks
    * (0 = off). The per-task cap alone lets an executor running T tasks
    * open T×maxConcurrencyTask store connections at once — this bounds
    * the whole JVM to one connection-pool-sized budget, which is what an
    * object store actually meters. Beyond the reference, which keeps only
    * per-task limits (`S3ShuffleDispatcher.scala:55-58`). */
  val maxConcurrencyExecutor: Int = conf.getInt(MAX_EXEC_CONCURRENCY_KEY, 0)

  private val executorFetchPermits =
    if (maxConcurrencyExecutor > 0)
      Some(new java.util.concurrent.Semaphore(maxConcurrencyExecutor, true))
    else None

  /** Run `f` holding one executor-wide fetch permit (no-op when the cap
    * is off). Callers must NOT block on per-task budgets inside `f` —
    * acquire memory first, then the permit, so a memory-stalled task
    * never starves the whole executor's fetch pool. */
  private[cloud] def withFetchPermit[T](f: => T): T = executorFetchPermits match {
    case Some(sem) =>
      sem.acquire()
      try f finally sem.release()
    case None => f
  }

  /** Observable permit count (-1 when the cap is off) — diagnostics. */
  def availableFetchPermits: Int =
    executorFetchPermits.map(_.availablePermits()).getOrElse(-1)
  val prefetchEnabled: Boolean = conf.getBoolean(PREFETCH_KEY, defaultValue = true)
  val adaptiveConcurrency: Boolean = conf.getBoolean(ADAPTIVE_KEY, defaultValue = true)
  /** Per-task read-side statistics (bytes, wait/prefetch time, MiB/s) at
    * INFO on task completion — reference `S3BufferedPrefetchIterator.scala:
    * 155-186`. Off by default: zero timing calls on the consumer path. */
  val readStatistics: Boolean = conf.getBoolean(READ_STATS_KEY, defaultValue = false)
  val cleanupShuffleFiles: Boolean = conf.getBoolean(CLEANUP_KEY, defaultValue = true)
  val relocateMapStatus: Boolean = conf.getBoolean(RELOCATE_KEY, defaultValue = true)
  /** Write-side checksums ride on Spark's own `spark.shuffle.checksum.*`. */
  val checksumEnabled: Boolean = conf.getBoolean("spark.shuffle.checksum.enabled", defaultValue = true)
  val checksumAlgorithm: String = conf.get("spark.shuffle.checksum.algorithm", "ADLER32")
  val validateChecksums: Boolean =
    conf.getBoolean(VALIDATE_KEY, defaultValue = false) && checksumEnabled
  /** false = enumerate blocks by listing `.index` objects on the store
    * instead of asking the driver's MapOutputTracker (debug fallback,
    * reference `S3ShuffleReader.scala:182-195`). */
  val useDriverTracker: Boolean = conf.getBoolean(TRACKER_KEY, defaultValue = true)
  /** Write the index object even for all-empty map outputs (reference
    * `alwaysCreateIndex`, `S3ShuffleMapOutputWriter.scala:111`). Forced on
    * in listing mode: an index-less empty map is invisible to a listing,
    * and the reader's dup-attempt cross-check would then refuse the read
    * (listed < registered) on a perfectly healthy shuffle. */
  val alwaysCreateIndex: Boolean =
    conf.getBoolean(ALWAYS_INDEX_KEY, defaultValue = false) || !useDriverTracker

  private val hadoopConf = SparkHadoopUtil.get.newConfiguration(conf)
  // Hadoop streams default to io.file.buffer.size = 4 KB — every store
  // read/write becomes 8× the syscalls of Spark's own 32 KB shuffle
  // buffers. Respect an explicit setting; otherwise raise to 128 KB
  // (object-store sweet spot, and measured ~2× shuffle-write time on
  // throughput-bound local writes at 4 KB).
  if (hadoopConf.get("io.file.buffer.size") == null ||
      hadoopConf.getInt("io.file.buffer.size", 4096) == 4096)
    hadoopConf.setInt("io.file.buffer.size", 131072)
  val fs: FileSystem = {
    // newInstance, NOT get: FileSystem.get returns a JVM-cached instance
    // shared with every other file:// user (Spark's parquet committers,
    // dd14's compactIndex), and the checksum/buffer settings below must
    // not leak into their writes — the FS cache key ignores the conf, so
    // mutating the cached instance would change behavior for the whole
    // JVM depending on who initialized it first.
    val f = FileSystem.newInstance(URI.create(rootDir), hadoopConf)
    // Hadoop's `file://` FS is a ChecksumFileSystem: every create ALSO
    // writes a .crc sidecar (a second file create + CRC32 over every
    // byte) and every open stats the sidecar first. That layer is pure
    // duplication here — the plugin carries its own integrity checks
    // (Spark's checksum file format, validated streaming-side in
    // CloudBlockStream) — and it showed up as the A/B lane's overhead
    // tail: shuffle WRITE time ~10× the default manager's on small
    // shuffles (tools/OverheadProfile, r10). Object-store FSs (s3a)
    // implement both calls as no-ops, so this only changes local runs.
    f.setWriteChecksum(false)
    f.setVerifyChecksum(false)
    f
  }
  val isLocalFs: Boolean = URI.create(rootDir).getScheme == "file"

  /** (shuffleId, mapId) coordinates of any supported shuffle block. */
  private def coords(blockId: BlockId): (Int, Long) = blockId match {
    case ShuffleBlockId(s, m, _)         => (s, m)
    case ShuffleBlockBatchId(s, m, _, _) => (s, m)
    case ShuffleDataBlockId(s, m, _)     => (s, m)
    case ShuffleIndexBlockId(s, m, _)    => (s, m)
    case ShuffleChecksumBlockId(s, m, _) => (s, m)
    case other =>
      throw new IllegalArgumentException(s"Unsupported shuffle block: $other")
  }

  def blockPath(blockId: BlockId): Path = {
    val (shuffleId, mapId) = coords(blockId)
    if (useSparkShuffleFetch) {
      // Spark's FallbackStorage layout: appId/shuffleId/hash(name)/name
      val hash = org.apache.spark.network.util.JavaUtils.nonNegativeHash(blockId.name)
      new Path(s"$rootDir/$appId/$shuffleId/$hash/${blockId.name}")
    } else {
      val prefix = (mapId % folderPrefixes + folderPrefixes) % folderPrefixes
      new Path(s"$rootDir/$prefix/$appId/$shuffleId/${blockId.name}")
    }
  }

  /** Open a block for ranged reads; FS readahead is disabled because the
    * reader issues positioned reads of exactly the byte ranges it needs. */
  def openBlock(blockId: BlockId): FSDataInputStream = {
    val in = fs.open(blockPath(blockId))
    try in.setReadahead(0L)
    catch { case _: UnsupportedOperationException => }
    in
  }

  def createBlock(blockId: BlockId): FSDataOutputStream =
    fs.create(blockPath(blockId), true)

  def blockExists(blockId: BlockId): Boolean = fs.exists(blockPath(blockId))

  def deleteBlock(blockId: BlockId): Unit =
    try fs.delete(blockPath(blockId), false)
    catch { case e: Exception => logDebug(s"delete ${blockId.name}: $e") }

  /** Delete every object of one shuffle — one future per folder prefix so
    * object-store deletes proceed in parallel. */
  def deleteShuffle(shuffleId: Int): Unit =
    if (useSparkShuffleFetch) deleteOne(new Path(s"$rootDir/$appId/$shuffleId"))
    else parallelDelete(p => new Path(s"$rootDir/$p/$appId/$shuffleId"))

  /** Delete every object this application wrote. */
  def deleteAppFolders(): Unit =
    if (useSparkShuffleFetch) deleteOne(new Path(s"$rootDir/$appId"))
    else parallelDelete(p => new Path(s"$rootDir/$p/$appId"))

  private def deleteOne(p: Path): Unit =
    try fs.delete(p, true)
    catch { case e: Exception => logDebug(s"delete $p: $e") }

  /** Map ids of every committed map output of a shuffle, discovered by
    * listing `.index` objects across all folder prefixes in parallel. */
  def listMapIds(shuffleId: Int): Seq[Long] = {
    implicit val ec: ExecutionContext = CloudShuffleEnv.deleteEc
    val pattern = ("shuffle_" + shuffleId + "_(\\d+)_\\d+\\.index").r
    val fut = Future.sequence((0 until folderPrefixes).map { p =>
      Future {
        val dir = new Path(s"$rootDir/$p/$appId/$shuffleId")
        try fs.listStatus(dir).toSeq.flatMap { st =>
          st.getPath.getName match {
            case pattern(mapId) => Some(mapId.toLong)
            case _              => None
          }
        } catch { case _: java.io.FileNotFoundException => Seq.empty }
      }
    })
    Await.result(fut, Duration.Inf).flatten.sorted
  }

  private def parallelDelete(path: Int => Path): Unit = {
    implicit val ec: ExecutionContext = CloudShuffleEnv.deleteEc
    val fut = Future.sequence((0 until folderPrefixes).map { p =>
      Future {
        try fs.delete(path(p), true)
        catch { case e: Exception => logDebug(s"delete ${path(p)}: $e") }
      }
    })
    try Await.result(fut, Duration.Inf)
    catch { case e: Exception => logWarning(s"parallel delete failed: $e") }
  }
}

object CloudShuffleEnv extends Logging {
  val ROOT_DIR_KEY = "spark.shuffle.cloud.rootDir"
  val PREFIXES_KEY = "spark.shuffle.cloud.folderPrefixes"
  val WRITE_BUFFER_KEY = "spark.shuffle.cloud.writeBufferSize"
  val READ_BUFFER_KEY = "spark.shuffle.cloud.readBufferSize"
  val MAX_BUFFER_TASK_KEY = "spark.shuffle.cloud.maxBufferSizeTask"
  val MAX_CONCURRENCY_KEY = "spark.shuffle.cloud.maxConcurrencyTask"
  val PREFETCH_KEY = "spark.shuffle.cloud.prefetch"
  val ADAPTIVE_KEY = "spark.shuffle.cloud.adaptiveConcurrency"
  val CLEANUP_KEY = "spark.shuffle.cloud.cleanup"
  val RELOCATE_KEY = "spark.shuffle.cloud.relocateMapStatus"
  val VALIDATE_KEY = "spark.shuffle.cloud.checksum.validate"
  val TRACKER_KEY = "spark.shuffle.cloud.useDriverTracker"
  val READ_STATS_KEY = "spark.shuffle.cloud.readStatistics"
  val ALWAYS_INDEX_KEY = "spark.shuffle.cloud.alwaysCreateIndex"
  val SPARK_FETCH_KEY = "spark.shuffle.cloud.useSparkShuffleFetch"
  val MAX_EXEC_CONCURRENCY_KEY = "spark.shuffle.cloud.maxConcurrencyExecutor"

  private val deleteEc: ExecutionContext =
    ExecutionContext.fromExecutorService(Executors.newCachedThreadPool { r =>
      val t = new Thread(r, "cloud-shuffle-delete")
      t.setDaemon(true)
      t
    })

  @volatile private var instance: CloudShuffleEnv = _

  /** Get (or lazily create) the process-wide env. `appIdHint` comes from
    * `ShuffleExecutorComponents.initializeExecutor`; on the driver the app
    * id is read from the SparkConf once the context has set it. */
  def get(appIdHint: Option[String] = None): CloudShuffleEnv = {
    val cur = instance
    val wantApp = appIdHint.orElse(currentAppId)
    if (cur != null && wantApp.forall(_ == cur.appId)) return cur
    synchronized {
      val cur2 = instance
      val wantApp2 = appIdHint.orElse(currentAppId)
      if (cur2 != null && wantApp2.forall(_ == cur2.appId)) return cur2
      val conf = Option(SparkEnv.get).map(_.conf).getOrElse(new SparkConf())
      val appId = wantApp2.getOrElse(
        throw new IllegalStateException("cloud shuffle: no app id available yet"))
      // the FS is a private newInstance (not the JVM-cached one) — close
      // the replaced env's handle instead of leaking it per context
      if (cur2 != null) try cur2.fs.close() catch { case _: Exception => }
      instance = new CloudShuffleEnv(conf, appId)
      CloudShuffleIndex.purgeAll()
      logInfo(s"cloud shuffle env for app $appId rooted at ${instance.rootDir}")
      instance
    }
  }

  private def currentAppId: Option[String] =
    Option(SparkEnv.get).flatMap(e => e.conf.getOption("spark.app.id"))

  /** Test hook: drop the singleton so a new SparkContext re-creates it. */
  def reset(): Unit = synchronized {
    if (instance != null) try instance.fs.close() catch { case _: Exception => }
    instance = null
    CloudShuffleIndex.purgeAll()
  }
}

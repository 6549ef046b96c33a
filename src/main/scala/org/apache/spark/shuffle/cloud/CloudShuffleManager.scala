package org.apache.spark.shuffle.cloud

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.{ShuffleDependency, SparkConf, SparkEnv, TaskContext}
import org.apache.spark.internal.Logging
import org.apache.spark.scheduler.MapStatus
import org.apache.spark.shuffle._
import org.apache.spark.shuffle.api.ShuffleExecutorComponents
import org.apache.spark.shuffle.sort.{BypassMergeSortShuffleHandle,
  CloudSortWriters, SerializedShuffleHandle, SortShuffleManager,
  SortShuffleWriter, UnsafeShuffleWriter}
import org.apache.spark.storage.FallbackStorage

/** Cloud-backed `ShuffleManager`: shuffle data lives on a Hadoop-FS object
  * store instead of executor local disk, enabling elastic scaling and
  * executor decommissioning without shuffle recomputation.
  *
  * Re-expression of the reference's manager
  * (`sort/S3ShuffleManager.scala:38-187`) for Spark 4.1.2: handle selection
  * and the three write strategies are Spark's own — the redirection happens
  * entirely inside [[CloudShuffleDataIO]]'s components, which every writer
  * streams through — and the read side is [[CloudShuffleReader]].
  *
  * Usage:
  * {{{
  *   spark.shuffle.manager=org.apache.spark.shuffle.cloud.CloudShuffleManager
  *   spark.shuffle.sort.io.plugin.class=org.apache.spark.shuffle.cloud.CloudShuffleDataIO
  *   spark.shuffle.cloud.rootDir=s3a://bucket/shuffle   (or any Hadoop FS)
  * }}}
  */
class CloudShuffleManager(conf: SparkConf) extends ShuffleManager with Logging {

  import CloudShuffleManager._

  // fail fast: without our ShuffleDataIO the writers would scatter shuffle
  // files onto executor-local disk while the reader looks at the store
  // (reference keeps the same gate, `S3ShuffleManager.scala:190-195`)
  {
    val plugin = conf.get("spark.shuffle.sort.io.plugin.class", "")
    require(plugin == classOf[CloudShuffleDataIO].getName,
      s"CloudShuffleManager requires spark.shuffle.sort.io.plugin.class=" +
        s"${classOf[CloudShuffleDataIO].getName} (found '$plugin')")
    // Push-based shuffle writes ShufflePushBlockId/ShuffleMergedBlockId
    // blocks through external merger services that never exist on an
    // object-store layout — the path mapper would only meet them mid-job
    // as an opaque IllegalArgumentException. Refuse at init with the fix
    // spelled out (push-based merging is moot when every reducer already
    // reads merged ranges straight from the store).
    require(!conf.getBoolean("spark.shuffle.push.enabled", defaultValue = false),
      "cloud shuffle does not support push-based shuffle; set " +
        "spark.shuffle.push.enabled=false (merged-block IDs have no " +
        "object-store path, and server-side merge adds nothing when " +
        "reducers already read contiguous ranges from the store)")
    // With MapStatus relocation every map output advertises the fallback
    // block manager's fake host, which reduce locality then turns into a
    // preferred location no executor can ever satisfy. Under delay
    // scheduling (spark.locality.wait > 0) such a task can starve
    // INDEFINITELY once no other task-finish event re-offers resources.
    // Object-store shuffle has no reduce locality to exploit anyway.
    if (conf.getBoolean(CloudShuffleEnv.RELOCATE_KEY, defaultValue = true) &&
        conf.getBoolean("spark.shuffle.reduceLocality.enabled", defaultValue = true)) {
      logWarning("cloud shuffle: spark.shuffle.reduceLocality.enabled=true with " +
        "MapStatus relocation makes the fallback host every reducer's preferred " +
        "location and can DEADLOCK delay scheduling on an idle cluster; set " +
        "spark.shuffle.reduceLocality.enabled=false")
    }
  }

  private val registeredShuffleIds = ConcurrentHashMap.newKeySet[Integer]()

  private lazy val shuffleExecutorComponents: ShuffleExecutorComponents = {
    val components = ShuffleDataIOUtils.loadShuffleDataIO(conf).executor()
    val extraConfigs = conf.getAllWithPrefix(ShuffleDataIOUtils.SHUFFLE_SPARK_CONF_PREFIX).toMap
    components.initializeExecutor(conf.getAppId,
      SparkEnv.get.executorId, extraConfigs.asJava)
    components
  }

  override def registerShuffle[K, V, C](shuffleId: Int,
      dependency: ShuffleDependency[K, V, C]): ShuffleHandle = {
    registeredShuffleIds.add(shuffleId)
    // Spark's own three-way strategy choice (reference reuses it verbatim,
    // `S3ShuffleManager.scala:52-71`)
    if (SortShuffleWriter.shouldBypassMergeSort(conf, dependency)) {
      new BypassMergeSortShuffleHandle[K, V](
        shuffleId, dependency.asInstanceOf[ShuffleDependency[K, V, V]])
    } else if (SortShuffleManager.canUseSerializedShuffle(dependency)) {
      new SerializedShuffleHandle[K, V](
        shuffleId, dependency.asInstanceOf[ShuffleDependency[K, V, V]])
    } else {
      new BaseShuffleHandle(shuffleId, dependency)
    }
  }

  override def getWriter[K, V](handle: ShuffleHandle, mapId: Long,
      context: TaskContext,
      metrics: ShuffleWriteMetricsReporter): ShuffleWriter[K, V] = {
    val env = SparkEnv.get
    val base: ShuffleWriter[K, V] = handle match {
      case unsafeShuffleHandle: SerializedShuffleHandle[K @unchecked, V @unchecked] =>
        new UnsafeShuffleWriter(env.blockManager, context.taskMemoryManager(),
          unsafeShuffleHandle, mapId, context, env.conf, metrics,
          shuffleExecutorComponents)
      case bypassShuffleHandle: BypassMergeSortShuffleHandle[K @unchecked, V @unchecked] =>
        CloudSortWriters.newBypassWriter(env.blockManager, bypassShuffleHandle,
          mapId, env.conf, metrics, shuffleExecutorComponents)
      case other: BaseShuffleHandle[K @unchecked, V @unchecked, _] =>
        new SortShuffleWriter(other, mapId, context, metrics,
          shuffleExecutorComponents)
    }
    if (CloudShuffleEnv.get().relocateMapStatus) new RelocatingShuffleWriter(base)
    else base
  }

  override def getReader[K, C](handle: ShuffleHandle, startMapIndex: Int,
      endMapIndex: Int, startPartition: Int, endPartition: Int,
      context: TaskContext,
      metrics: ShuffleReadMetricsReporter): ShuffleReader[K, C] = {
    val batch = SortShuffleManager.canUseBatchFetch(startPartition, endPartition, context)
    if (CloudShuffleEnv.get().useSparkShuffleFetch) {
      // Spark-native read path: blocks live at the fallback block manager
      // (MapStatus relocation) and Spark's own reader fetches them through
      // FallbackStorage from the store
      val env = SparkEnv.get
      val blocksByAddress = env.mapOutputTracker.getMapSizesByExecutorId(
        handle.shuffleId, startMapIndex, endMapIndex, startPartition, endPartition)
      new BlockStoreShuffleReader(
        handle.asInstanceOf[BaseShuffleHandle[K, _, C]], blocksByAddress,
        context, metrics, env.serializerManager, env.blockManager,
        env.mapOutputTracker, shouldBatchFetch = batch)
    } else {
      new CloudShuffleReader(
        handle.asInstanceOf[BaseShuffleHandle[K, _, C]],
        startMapIndex, endMapIndex, startPartition, endPartition,
        context, metrics, shouldBatchFetch = batch)
    }
  }

  override def unregisterShuffle(shuffleId: Int): Boolean = {
    registeredShuffleIds.remove(shuffleId)
    CloudShuffleIndex.purgeShuffle(shuffleId)
    val env = CloudShuffleEnv.get()
    if (env.cleanupShuffleFiles) env.deleteShuffle(shuffleId)
    true
  }

  override val shuffleBlockResolver: ShuffleBlockResolver =
    new IndexShuffleBlockResolver(conf)

  override def stop(): Unit = {
    shuffleBlockResolver.stop()
  }

  private implicit class MapAsJava[A, B](m: Map[A, B]) {
    def asJava: java.util.Map[A, B] = {
      val j = new java.util.HashMap[A, B]()
      m.foreach { case (k, v) => j.put(k, v) }
      j
    }
  }
}

object CloudShuffleManager {
  /** Reduce id used in data/index block names — the whole map output lives
    * in one object, so the per-reduce id slot is a constant. */
  val NOOP_REDUCE_ID: Int = 0
}

/** Decorator rewriting the committed MapStatus location to the fallback
  * block-manager id: reducers resolve blocks from the object store, so the
  * map output must not be tied to the (possibly decommissioned) mapper
  * executor (reference: `S3ShuffleWriter.scala:7-21`). */
private[cloud] class RelocatingShuffleWriter[K, V](under: ShuffleWriter[K, V])
    extends ShuffleWriter[K, V] {

  override def write(records: Iterator[Product2[K, V]]): Unit = under.write(records)

  override def stop(success: Boolean): Option[MapStatus] = {
    val status = under.stop(success)
    status.foreach(_.updateLocation(FallbackStorage.FALLBACK_BLOCK_MANAGER_ID))
    status
  }

  override def getPartitionLengths(): Array[Long] = under.getPartitionLengths()
}

package org.apache.spark.shuffle.sort

import org.apache.spark.{SparkConf, TaskContext}
import org.apache.spark.shuffle.{ShuffleWriter, ShuffleWriteMetricsReporter}
import org.apache.spark.shuffle.api.ShuffleExecutorComponents
import org.apache.spark.storage.BlockManager

/** `BypassMergeSortShuffleWriter` is Java package-private; this factory is
  * the one symbol the cloud shuffle manager needs from inside
  * `org.apache.spark.shuffle.sort` (the reference solves the same problem
  * by living in this package, `S3ShuffleManager.scala:23`). */
private[spark] object CloudSortWriters {

  def newBypassWriter[K, V](blockManager: BlockManager,
      handle: BypassMergeSortShuffleHandle[K, V], mapId: Long, conf: SparkConf,
      metrics: ShuffleWriteMetricsReporter,
      components: ShuffleExecutorComponents): ShuffleWriter[K, V] =
    new BypassMergeSortShuffleWriter[K, V](
      blockManager, handle, mapId, conf, metrics, components)
}

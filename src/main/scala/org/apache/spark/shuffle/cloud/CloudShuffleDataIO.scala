package org.apache.spark.shuffle.cloud

import java.io.{BufferedOutputStream, IOException, OutputStream}
import java.nio.file.Files
import java.util.{Collections, Optional}

import org.apache.hadoop.fs.Path
import org.apache.spark.SparkConf
import org.apache.spark.internal.Logging
import org.apache.spark.shuffle.api._
import org.apache.spark.shuffle.api.metadata.MapOutputCommitMessage
import org.apache.spark.storage.ShuffleDataBlockId

/** `ShuffleDataIO` plugin: Spark's writers stream their output through these
  * components, which is where the redirection to the Hadoop-FS object store
  * happens (reference: `S3ShuffleDataIO.scala:22-69`).
  */
class CloudShuffleDataIO(conf: SparkConf) extends ShuffleDataIO {
  override def executor(): ShuffleExecutorComponents = new CloudExecutorComponents(conf)
  override def driver(): ShuffleDriverComponents = new CloudDriverComponents(conf)
}

private[cloud] class CloudExecutorComponents(conf: SparkConf)
    extends ShuffleExecutorComponents with Logging {

  private var env: CloudShuffleEnv = _

  override def initializeExecutor(appId: String, execId: String,
      extraConfigs: java.util.Map[String, String]): Unit = {
    env = CloudShuffleEnv.get(Some(appId))
  }

  override def createMapOutputWriter(shuffleId: Int, mapTaskId: Long,
      numPartitions: Int): ShuffleMapOutputWriter =
    new CloudMapOutputWriter(env, shuffleId, mapTaskId, numPartitions)

  override def createSingleFileMapOutputWriter(shuffleId: Int,
      mapId: Long): Optional[SingleSpillShuffleMapOutputWriter] =
    Optional.of(new CloudSingleSpillWriter(env, shuffleId, mapId))
}

private[cloud] class CloudDriverComponents(conf: SparkConf)
    extends ShuffleDriverComponents with Logging {

  override def initializeApplication(): java.util.Map[String, String] = {
    if (conf.getBoolean(CloudShuffleEnv.SPARK_FETCH_KEY, defaultValue = false)) {
      // Spark-native fetch: the fallback block manager must exist in the
      // master so reducers can resolve blocks relocated to it
      val env = org.apache.spark.SparkEnv.get
      org.apache.spark.storage.FallbackStorage.registerBlockManagerIfNeeded(
        env.blockManager.master, conf,
        org.apache.spark.deploy.SparkHadoopUtil.get.newConfiguration(conf))
    }
    Collections.emptyMap()
  }

  override def cleanupApplication(): Unit = {
    val env = CloudShuffleEnv.get()
    if (env.cleanupShuffleFiles) {
      logInfo(s"cleaning up cloud shuffle folders under ${env.rootDir}")
      env.deleteAppFolders()
    }
  }

  override def removeShuffle(shuffleId: Int, blocking: Boolean): Unit = {
    val env = CloudShuffleEnv.get()
    if (env.cleanupShuffleFiles) env.deleteShuffle(shuffleId)
    CloudShuffleIndex.purgeShuffle(shuffleId)
  }

  /** Shuffle data lives on the object store, not on executors — executor
    * loss does not invalidate map outputs. */
  override def supportsReliableStorage(): Boolean = true
}

/** Streams every reduce partition of one map task into a single object
  * (`shuffle_<id>_<map>_0.data`) and records per-partition lengths; on
  * commit, writes the prefix-sum index and checksum blobs.
  *
  * One object per map task (reference: `S3ShuffleMapOutputWriter.scala:22`)
  * keeps object-store request counts O(maps), not O(maps × reducers) —
  * the property that makes the layout survive 100 TB shuffles.
  */
private[cloud] class CloudMapOutputWriter(env: CloudShuffleEnv, shuffleId: Int,
    mapId: Long, numPartitions: Int) extends ShuffleMapOutputWriter with Logging {

  private val partitionLengths = new Array[Long](numPartitions)
  private var lastPartitionId = -1
  private var bytesWritten = 0L
  private var stream: OutputStream = _

  private def ensureStream(): OutputStream = {
    if (stream == null) {
      val raw = env.createBlock(
        ShuffleDataBlockId(shuffleId, mapId, CloudShuffleManager.NOOP_REDUCE_ID))
      stream = new MeteredOutputStream(
        new BufferedOutputStream(raw, env.writeBufferSize),
        s"shuffle $shuffleId map $mapId")
    }
    stream
  }

  override def getPartitionWriter(reducePartitionId: Int): ShufflePartitionWriter = {
    if (reducePartitionId <= lastPartitionId) {
      throw new IllegalArgumentException(
        s"partition writers must be requested in monotonic order: " +
          s"$reducePartitionId after $lastPartitionId")
    }
    lastPartitionId = reducePartitionId
    new PartitionWriter(reducePartitionId)
  }

  private final class PartitionWriter(partitionId: Int) extends ShufflePartitionWriter {
    private var count = 0L

    private def recordBytes(n: Long): Unit = {
      count += n
      partitionLengths(partitionId) = count
      bytesWritten += n
    }

    override def openStream(): OutputStream = new OutputStream {
      private val under = ensureStream()
      override def write(b: Int): Unit = {
        under.write(b)
        recordBytes(1)
      }
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        under.write(b, off, len)
        recordBytes(len)
      }
      override def flush(): Unit = {} // object-store writes are commit-once
      override def close(): Unit = {} // shared stream closes at commit
    }

    /** Channel path: UnsafeShuffleWriter merges spill files with
      * `FileChannel.transferTo` when the partition writer offers a
      * channel — fewer byte[] hops than the stream path. */
    override def openChannelWrapper(): Optional[WritableByteChannelWrapper] = {
      ensureStream()
      Optional.of(new WritableByteChannelWrapper {
        private val inner = new java.nio.channels.WritableByteChannel {
          private val under = java.nio.channels.Channels.newChannel(stream)
          override def write(src: java.nio.ByteBuffer): Int = {
            val n = under.write(src)
            recordBytes(n)
            n
          }
          override def isOpen: Boolean = true
          override def close(): Unit = {} // shared stream closes at commit
        }
        override def channel(): java.nio.channels.WritableByteChannel = inner
        override def close(): Unit = {}
      })
    }

    override def getNumBytesWritten: Long = count
  }

  override def commitAllPartitions(checksums: Array[Long]): MapOutputCommitMessage = {
    if (stream != null) stream.close()
    val total = partitionLengths.sum
    if (total != bytesWritten) {
      throw new IOException(
        s"cloud shuffle corruption: partition lengths sum to $total " +
          s"but $bytesWritten bytes were written")
    }
    if (total > 0 || env.checksumEnabled || env.alwaysCreateIndex) {
      CloudShuffleIndex.writeIndex(env, shuffleId, mapId, partitionLengths)
    }
    if (env.checksumEnabled && checksums.nonEmpty) {
      CloudShuffleIndex.writeChecksums(env, shuffleId, mapId, checksums)
    }
    MapOutputCommitMessage.of(partitionLengths)
  }

  override def abort(error: Throwable): Unit = {
    try if (stream != null) stream.close()
    catch { case e: Exception => logDebug(s"abort close: $e") }
    env.deleteBlock(ShuffleDataBlockId(shuffleId, mapId, CloudShuffleManager.NOOP_REDUCE_ID))
  }
}

/** Fast path when the sort writer produced exactly one spill file: move it
  * (local FS) or stream-copy it (object store) as the data blob, then write
  * index + checksums (reference: `S3SingleSpillShuffleMapOutputWriter.scala:24-64`).
  */
private[cloud] class CloudSingleSpillWriter(env: CloudShuffleEnv, shuffleId: Int,
    mapId: Long) extends SingleSpillShuffleMapOutputWriter with Logging {

  override def transferMapSpillFile(mapSpillFile: java.io.File,
      partitionLengths: Array[Long], checksums: Array[Long]): Unit = {
    val blockId = ShuffleDataBlockId(shuffleId, mapId, CloudShuffleManager.NOOP_REDUCE_ID)
    val target = env.blockPath(blockId)
    if (env.isLocalFs) {
      val dst = java.nio.file.Paths.get(target.toUri.getPath)
      Files.createDirectories(dst.getParent)
      Files.move(mapSpillFile.toPath, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val out = new MeteredOutputStream(
        new BufferedOutputStream(env.createBlock(blockId), env.writeBufferSize),
        s"shuffle $shuffleId map $mapId (single spill)")
      val in = Files.newInputStream(mapSpillFile.toPath)
      try {
        val buf = new Array[Byte](env.writeBufferSize)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) out.write(buf, 0, n)
          n = in.read(buf)
        }
      } finally {
        in.close()
        out.close()
      }
    }
    CloudShuffleIndex.writeIndex(env, shuffleId, mapId, partitionLengths)
    if (env.checksumEnabled && checksums.nonEmpty) {
      CloudShuffleIndex.writeChecksums(env, shuffleId, mapId, checksums)
    }
  }
}

/** OutputStream decorator measuring bytes + wall time, logging MiB/s per
  * map task on close (reference: `S3MeasureOutputStream.scala:8-65`). */
private[cloud] class MeteredOutputStream(under: OutputStream, label: String)
    extends OutputStream with Logging {

  private var bytes = 0L
  private var nanos = 0L
  private var closed = false

  override def write(b: Int): Unit = {
    val t0 = System.nanoTime()
    under.write(b)
    nanos += System.nanoTime() - t0
    bytes += 1
  }

  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    val t0 = System.nanoTime()
    under.write(b, off, len)
    nanos += System.nanoTime() - t0
    bytes += len
  }

  override def flush(): Unit = under.flush()

  override def close(): Unit = {
    if (closed) return
    closed = true
    val t0 = System.nanoTime()
    under.close()
    nanos += System.nanoTime() - t0
    val mib = bytes / 1024.0 / 1024.0
    val sec = math.max(nanos / 1e9, 1e-9)
    logInfo(f"$label: wrote $mib%.2f MiB in $sec%.3f s (${mib / sec}%.1f MiB/s)")
  }
}

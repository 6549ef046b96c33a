package org.apache.spark.shuffle.cloud

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.util.concurrent.ConcurrentHashMap
import java.util.zip.{Adler32, CRC32, CRC32C, Checksum}

import org.apache.spark.internal.Logging
import org.apache.spark.storage.{BlockId, ShuffleChecksumBlockId, ShuffleIndexBlockId}

/** Index + checksum codec for cloud shuffle blocks.
  *
  * Wire format (kept bit-identical to the reference for drop-in parity,
  * `helper/S3ShuffleHelper.scala:44-59,94-121`):
  *  - index blob  = big-endian longs `[0, l0, l0+l1, …, Σl]` — the prefix
  *    sums of the reduce-partition lengths, so `acc(r)..acc(r+1)` is the
  *    byte range of reduce partition `r` inside the map task's data blob;
  *  - checksum blob = one big-endian long per reduce partition
  *    (ADLER32 / CRC32 / CRC32C value).
  *
  * Both are tiny and read often (every reducer touches every map's index),
  * so they are cached per-JVM.
  */
private[cloud] object CloudShuffleIndex extends Logging {

  private val indexCache = new ConcurrentHashMap[BlockId, Array[Long]]()
  private val checksumCache = new ConcurrentHashMap[BlockId, Array[Long]]()

  /** `[0, l0, l0+l1, …]` — length n+1, exact cumulative byte offsets. */
  def prefixSums(lengths: Array[Long]): Array[Long] = {
    val acc = new Array[Long](lengths.length + 1)
    var i = 0
    var s = 0L
    while (i < lengths.length) {
      s += lengths(i)
      acc(i + 1) = s
      i += 1
    }
    acc
  }

  def writeIndex(env: CloudShuffleEnv, shuffleId: Int, mapId: Long,
      partitionLengths: Array[Long]): Unit = {
    val blockId = ShuffleIndexBlockId(shuffleId, mapId, CloudShuffleManager.NOOP_REDUCE_ID)
    val acc = prefixSums(partitionLengths)
    writeLongs(env, blockId, acc)
    indexCache.put(blockId, acc)
  }

  def writeChecksums(env: CloudShuffleEnv, shuffleId: Int, mapId: Long,
      checksums: Array[Long]): Unit = {
    if (checksums.isEmpty) return
    val blockId = ShuffleChecksumBlockId(shuffleId, mapId, 0)
    writeLongs(env, blockId, checksums)
    checksumCache.put(blockId, checksums)
  }

  /** Cumulative offsets for one map task's data blob, cached. */
  def readIndex(env: CloudShuffleEnv, shuffleId: Int, mapId: Long): Array[Long] = {
    val blockId = ShuffleIndexBlockId(shuffleId, mapId, CloudShuffleManager.NOOP_REDUCE_ID)
    indexCache.computeIfAbsent(blockId, _ => readLongs(env, blockId))
  }

  def readChecksums(env: CloudShuffleEnv, shuffleId: Int, mapId: Long): Array[Long] = {
    val blockId = ShuffleChecksumBlockId(shuffleId, mapId, 0)
    checksumCache.computeIfAbsent(blockId, _ => readLongs(env, blockId))
  }

  def purgeShuffle(shuffleId: Int): Unit = {
    purge(indexCache, shuffleId)
    purge(checksumCache, shuffleId)
  }

  private def purge(cache: ConcurrentHashMap[BlockId, Array[Long]], shuffleId: Int): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) {
      val matches = it.next() match {
        case ShuffleIndexBlockId(s, _, _)    => s == shuffleId
        case ShuffleChecksumBlockId(s, _, _) => s == shuffleId
        case _                               => false
      }
      if (matches) it.remove()
    }
  }

  def purgeAll(): Unit = {
    indexCache.clear()
    checksumCache.clear()
  }

  private def writeLongs(env: CloudShuffleEnv, blockId: BlockId, values: Array[Long]): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(env.createBlock(blockId)))
    try values.foreach(out.writeLong)
    finally out.close()
  }

  private def readLongs(env: CloudShuffleEnv, blockId: BlockId): Array[Long] = {
    val in = new DataInputStream(new BufferedInputStream(env.openBlock(blockId)))
    try {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      try {
        while (true) buf += in.readLong()
      } catch { case _: EOFException => }
      buf.toArray
    } finally in.close()
  }

  /** Checksum factory for read-side validation (same algorithms Spark's
    * writers use via `spark.shuffle.checksum.algorithm`). */
  def newChecksum(algorithm: String): Checksum = algorithm.toUpperCase match {
    case "ADLER32" => new Adler32()
    case "CRC32"   => new CRC32()
    case "CRC32C"  => new CRC32C()
    case other =>
      throw new UnsupportedOperationException(s"checksum algorithm $other")
  }
}

package org.apache.spark.shuffle.cloud

import java.io.{ByteArrayInputStream, InputStream, SequenceInputStream}
import java.util.concurrent.LinkedBlockingQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.internal.Logging
import org.apache.spark.storage.BlockId

/** Asynchronous, memory-capped block prefetcher — the heart of read
  * performance against high-latency object stores.
  *
  * Behavioral spec from the reference (`S3BufferedPrefetchIterator.scala:
  * 16-213`): a pool of daemon threads pulls blocks off the fetch list,
  * buffers up to `min(blockSize, maxBufferSizeTask-share)` bytes each, and
  * hands completed buffers to the consuming task thread through a blocking
  * queue; total buffered bytes never exceed `maxBufferSizeTask`. Thread
  * count adapts to observed fetch latency (`:32-94`): a hill-climbing
  * controller compares the recent average latency against the previous
  * window and steps the concurrency up when latency is flat/improving,
  * down when it degrades — bounded by `[1, maxConcurrencyTask]`.
  *
  * Completion order is delivery order: reducers don't care which map's
  * block arrives first, so the queue never head-of-line blocks.
  */
private[cloud] class CloudPrefetchIterator(env: CloudShuffleEnv,
    blocks: IndexedSeq[(BlockId, CloudBlockStream, InputStream)])
    extends Iterator[(BlockId, InputStream)] with Logging {

  private case class Fetched(blockId: BlockId, stream: InputStream, buffered: Long)

  private val nextIdx = new AtomicInteger(0)
  private val queue = new LinkedBlockingQueue[Either[Throwable, Fetched]]()
  private var delivered = 0
  private val total = blocks.length

  // --- read-side statistics (reference S3BufferedPrefetchIterator.scala:
  // 155-186) — all fields only touched when env.readStatistics is on, so
  // the disabled path pays zero timing calls
  private val statsEnabled = env.readStatistics
  private val startNanos = if (statsEnabled) System.nanoTime() else 0L
  private val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
  private val prefetchNanos = new java.util.concurrent.atomic.AtomicLong(0L)
  private var waitNanos = 0L // consumer thread only
  private val statsLogged = new java.util.concurrent.atomic.AtomicBoolean(false)

  // Early-terminating consumers (limit/take) never reach delivered == total,
  // so the drain-side emission below would silently drop their tasks from
  // the per-task stats sample (ADVICE r3). A task-completion listener
  // catches those; the AtomicBoolean makes the emission exactly-once
  // whichever path fires first. Outside a task (unit tests) the drain-side
  // emission is the only path — same behavior as before.
  if (statsEnabled) {
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit] { _ => logStatistics() }
  }

  private def logStatistics(): Unit = {
    if (!statsLogged.compareAndSet(false, true)) return
    val totalNanos = math.max(1L, System.nanoTime() - startNanos)
    val bR = bytesRead.get()
    val tP = prefetchNanos.get() / 1000000
    val tW = waitNanos / 1000000
    val n = math.max(1, total)
    val mibs = if (tP > 0) bR.toDouble / (tP.toDouble / 1000) / (1024 * 1024) else 0.0
    logInfo(f"cloud shuffle read stats: $delivered/$total blocks, $bR bytes, " +
      f"$tW ms waiting (${tW / n} avg), $tP ms prefetching (${tP / n} avg, " +
      f"${bR / n} block size, $mibs%.1f MiB/s). " +
      f"Total: ${totalNanos / 1000000} ms - ${100 * waitNanos / totalNanos}%% waiting. " +
      f"$targetThreads target threads.")
  }

  // --- memory budget ------------------------------------------------------
  private val budgetLock = new Object
  private var bufferedBytes = 0L

  private def acquire(size: Long): Unit = budgetLock.synchronized {
    // Always admit at least one in-flight buffer to avoid deadlock on
    // blocks larger than the whole budget.
    while (bufferedBytes > 0 && bufferedBytes + size > env.maxBufferSizeTask) {
      budgetLock.wait()
    }
    bufferedBytes += size
  }

  private def release(size: Long): Unit = budgetLock.synchronized {
    bufferedBytes -= size
    budgetLock.notifyAll()
  }

  // --- adaptive concurrency ----------------------------------------------
  @volatile private var targetThreads =
    if (env.adaptiveConcurrency) math.min(2, env.maxConcurrencyTask)
    else env.maxConcurrencyTask
  private val latencyLock = new Object
  private var windowNanos = 0L
  private var windowCount = 0
  private var prevAvgNanos = Long.MaxValue
  private var lastStep = +1

  private def recordLatency(nanos: Long): Unit = {
    if (!env.adaptiveConcurrency) return
    latencyLock.synchronized {
      windowNanos += nanos
      windowCount += 1
      if (windowCount >= 8) {
        val avg = windowNanos / windowCount
        // keep moving in the same direction while latency improves;
        // reverse when it degrades by >10%
        val step = if (avg > prevAvgNanos + prevAvgNanos / 10) -lastStep else lastStep
        targetThreads = math.max(1, math.min(env.maxConcurrencyTask, targetThreads + step))
        lastStep = if (step == 0) 1 else step
        prevAvgNanos = avg
        windowNanos = 0L
        windowCount = 0
      }
    }
  }

  // --- worker pool --------------------------------------------------------
  private val activeWorkers = new AtomicInteger(0)
  // never start more workers than there are blocks: a 2-block reduce task
  // has no use for the other maxConcurrencyTask-2 threads, and their
  // create-then-immediately-return churn was a measurable slice of the
  // per-task fixed cost on tiny shuffles (tools/OverheadProfile, r10).
  // Semantics-preserving: a worker beyond `total` can never claim an
  // index, and the adaptive target only matters up to `total` workers.
  private val workers = (0 until math.min(env.maxConcurrencyTask, total)).map { i =>
    val t = new Thread(() => workLoop(i), s"cloud-shuffle-prefetch-$i")
    t.setDaemon(true)
    t
  }
  workers.foreach(_.start())

  private def workLoop(workerId: Int): Unit = {
    while (true) {
      // soft concurrency gate: workers beyond the adaptive target park
      if (workerId >= targetThreads) {
        val idx = nextIdx.get()
        if (idx >= total) return
        Thread.sleep(1)
      } else {
        val idx = nextIdx.getAndIncrement()
        if (idx >= total) return
        val (blockId, ranged, wrapped) = blocks(idx)
        val toBuffer = math.min(ranged.size, env.maxBufferSizeTask)
        var acquired = false
        try {
          acquire(toBuffer)
          acquired = true
          // memory first, THEN the executor-wide permit: a task parked on
          // its memory budget must not hold a fetch slot the rest of the
          // executor could use. The clock starts INSIDE the permit —
          // queue wait must not pollute the adaptive controller's
          // store-latency signal or the MiB/s statistics.
          var readNanos = 0L
          val buf = env.withFetchPermit {
            val t0 = System.nanoTime()
            val b = readUpTo(wrapped, toBuffer)
            readNanos = System.nanoTime() - t0
            b
          }
          recordLatency(readNanos)
          if (statsEnabled) {
            prefetchNanos.addAndGet(readNanos)
            bytesRead.addAndGet(buf.length.toLong)
          }
          val stream: InputStream =
            if (buf.length.toLong >= ranged.size || isExhausted(wrapped)) {
              wrapped.close()
              new ByteArrayInputStream(buf)
            } else {
              // block bigger than the budget: serve the buffered head, then
              // stream the tail straight from the store
              new SequenceInputStream(new ByteArrayInputStream(buf), wrapped)
            }
          queue.put(Right(Fetched(blockId, stream, toBuffer)))
        } catch {
          case t: Throwable =>
            // only give back budget that was actually taken — an exception
            // inside acquire() itself (e.g. interrupt while parked) must not
            // drive bufferedBytes negative and loosen the cap for others
            if (acquired) release(toBuffer)
            queue.put(Left(t))
            return
        }
      }
    }
  }

  /** The ranged stream reports its own exhaustion; wrappers (decompression)
    * don't, so probe conservatively: only a raw CloudBlockStream can be
    * declared done early. */
  private def isExhausted(s: InputStream): Boolean = s match {
    case c: CloudBlockStream => c.remainingBytes <= 0
    case _                   => false
  }

  private def readUpTo(in: InputStream, limit: Long): Array[Byte] = {
    // exact-size single allocation (r14, tools/Ts01Profile): the block's
    // buffered size is KNOWN up front (the index gives exact ranges), so
    // read straight into one right-sized array — the former
    // ByteArrayOutputStream + toByteArray pair double-copied and
    // double-allocated every block, a GC tax the read path pays at any
    // store latency. Blocks beyond byte[]-addressability buffer their
    // first 2 GB; the SequenceInputStream tail streams the rest.
    val size = math.min(limit, (Int.MaxValue - 16).toLong).toInt
    val buf = new Array[Byte](size)
    var off = 0
    var eof = false
    while (off < size && !eof) {
      val n = in.read(buf, off, size - off)
      if (n < 0) eof = true else off += n
    }
    if (off == size) buf else java.util.Arrays.copyOf(buf, off)
  }

  // --- consumer side ------------------------------------------------------
  override def hasNext: Boolean = delivered < total

  override def next(): (BlockId, InputStream) = {
    val w0 = if (statsEnabled) System.nanoTime() else 0L
    val taken = queue.take()
    if (statsEnabled) waitNanos += System.nanoTime() - w0
    taken match {
      case Left(err) =>
        throw new RuntimeException(s"cloud shuffle prefetch failed", err)
      case Right(f) =>
        delivered += 1
        // release the budget once the task thread owns the buffer: the
        // bytes are handed off, not duplicated
        release(f.buffered)
        if (statsEnabled && delivered == total) logStatistics()
        (f.blockId, f.stream)
    }
  }
}

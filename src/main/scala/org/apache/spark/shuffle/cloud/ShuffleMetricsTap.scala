package org.apache.spark.shuffle.cloud

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-query shuffle-volume accounting for `graft.Bench`.
  *
  * The reference's only published performance numbers are *shuffle volumes
  * per query* (reference `examples/run_benchmarks.sh:29-34`: q5 9.6 GB …
  * q67 66 GB), so the bench surfaces the same quantity next to wall time.
  * Every shuffle byte in this engine flows through the cloud plugin
  * (W8 measured output streams on the write side, the prefetch iterator on
  * the read side), and the task-level `ShuffleWriteMetrics` /
  * `ShuffleReadMetrics` Spark aggregates are fed by exactly those streams —
  * a `SparkListener` over task ends is the zero-overhead way to fold them
  * per query without threading counters through the plugin singletons.
  *
  * Lives in the plugin package because draining the listener queue between
  * queries needs `SparkContext.listenerBus` (`private[spark]`): without
  * `waitUntilEmpty` the async bus would bill a query's tail task-end events
  * to its successor. The class itself is public so `graft.Bench` can own
  * one; only the bus drain needs the package privilege.
  */
class ShuffleMetricsTap(sc: SparkContext) extends SparkListener {
  private val written = new LongAdder
  private val read = new LongAdder
  sc.addSparkListener(this)

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      written.add(m.shuffleWriteMetrics.bytesWritten)
      read.add(m.shuffleReadMetrics.totalBytesRead)
    }
  }

  /** Drain pending task-end events, then read-and-reset both counters.
    * Returns (shuffleBytesWritten, shuffleBytesRead) since the last call.
    *
    * Only meaningful when no job runs concurrently with the call (ADVICE
    * r6): `sumThenReset` makes each counter individually lossless, but a
    * task ending between the two calls still lands in the wrong harvest
    * window — the serial query-at-a-time loops of Bench/ScaleProbe are
    * the intended callers, and `waitUntilEmpty` only flushes events of
    * ALREADY-finished tasks.
    */
  def harvest(): (Long, Long) = {
    sc.listenerBus.waitUntilEmpty()
    (written.sumThenReset(), read.sumThenReset())
  }
}

package org.apache.spark

/** Test-only bridge to `private[spark]` SparkContext members the
  * decommission end-to-end test needs: executor ids are not exposed
  * through any public API (`getExecutorMemoryStatus` keys are host:port
  * strings, `statusTracker` drops the id).
  */
object GraftSparkTestAccess {
  def executorIds(sc: SparkContext): Seq[String] = sc.getExecutorIds()

  /** Drain the async listener bus so a test reading listener-fed counters
    * observes every event its job posted. */
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

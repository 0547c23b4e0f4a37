package org.apache.spark

/** Dev-tool bridge into the private[spark] listener bus: lets
  * [[graft.ProbeJobs]] drain job-end events deterministically instead
  * of sleeping a fixed interval (ADVICE r17 — a loaded bus dropped
  * late events from the snapshot, understating jobMs). */
object GraftListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}

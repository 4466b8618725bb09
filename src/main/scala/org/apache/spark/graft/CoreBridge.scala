package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into core-private SparkContext members (the [[SqlBridge]]
  * pattern for the non-sql side). Lives under org.apache.spark so
  * private[spark] members resolve.
  */
object CoreBridge {
  /** Block until the async listener bus has delivered every event queued
    * so far (probe-side: stage metrics must all land before the listener
    * is removed; a fixed sleep silently dropped late events on a loaded
    * bus). Throws TimeoutException when the bus stays busy past the
    * timeout — callers degrade gracefully. */
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}

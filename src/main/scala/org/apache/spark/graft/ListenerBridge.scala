package org.apache.spark.graft

import org.apache.spark.SparkContext

/**
 * Bridge into private[spark] listener-bus draining: progress metrics are
 * delivered asynchronously on the listener bus, so an exact "rows so far ==
 * rows in the finished job" assertion must drain pending events first (the
 * same call Spark's own test harness uses).
 */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}

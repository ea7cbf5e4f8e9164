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

  /** Restore a previously captured checkpoint-dir setting, INCLUDING the
    * unset state: the public setCheckpointDir cannot take None back, so a
    * scoped "use this reliable checkpoint dir for one operator" would
    * otherwise leak its dir into the caller's context forever. */
  def restoreCheckpointDir(sc: SparkContext, dir: Option[String]): Unit =
    sc.checkpointDir = dir
}

package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/**
 * Bridge to the `private[spark]` listener bus: the bench attributes
 * per-query counters (jobs / tasks / shuffle bytes) to the pass that
 * generated them, and listener events are delivered asynchronously — a
 * bounded drain between passes is the only way to keep the attribution
 * exact without sleeping inside the harness. Diagnostic path only;
 * never called inside a timed region.
 */
object ListenerBusAccess {
  /** Block until every queued listener event is delivered, or the
   *  timeout elapses — whichever first. Never throws. */
  def drain(sc: SparkContext, timeoutMs: Long = 2000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}

package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** One-method bridge into `private[spark]` listener-bus internals.
  *
  * The sweep harness ([[graft.SweepOne]]) attributes per-leg
  * executor task time (run + CPU) to the pass that produced it by
  * snapshotting a listener-maintained counter around each timed pass.
  * Task-end events are delivered asynchronously on the listener bus,
  * so a snapshot taken right after an action returns can miss the
  * tail of the job's events; `LiveListenerBus.waitUntilEmpty()` is
  * the exact barrier for that, but it is `private[spark]`. This shim
  * lives in an `org.apache.spark` subpackage solely to re-export it —
  * no other internals are touched, nothing is overridden.
  */
object ListenerFlush {
  /** Block until every queued listener event has been delivered.
    * A bus timeout (never observed locally; the bus default is
    * unbounded patience in this overload) degrades to a no-op —
    * the caller's counters then undercount, which reads as LESS
    * task time, never phantom time. */
  def flush(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}

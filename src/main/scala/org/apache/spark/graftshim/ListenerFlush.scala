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
  /** Block until every queued listener event has been delivered,
    * retrying once. Returns whether the bus actually drained.
    *
    * The no-arg `waitUntilEmpty()` is NOT unbounded: in Spark 4.1 it
    * delegates to `waitUntilEmpty(10 seconds)` and throws
    * `TimeoutException` past that (verified against the shipped
    * bytecode). A timed-out flush matters differently by position:
    * a timed-out POST-pass flush undercounts that pass (reads as
    * less task time — safe); a timed-out PRE-pass flush leaks the
    * PREVIOUS pass's still-queued task-end events into the next
    * snapshot delta, which OVERcounts the next pass's run/cpu. So
    * callers must treat `false` from a pre-pass flush as "this
    * pass's profile is unattributable" and drop the delta (record
    * the run/cpu samples as missing) rather than report an inflated
    * profile. Never observed locally — 10 s of queued listener
    * events would need a pathologically stalled bus — but the
    * failure mode is now typed instead of silently mis-signed. */
  def flush(sc: SparkContext): Boolean =
    drainOnce(sc) || drainOnce(sc)

  private def drainOnce(sc: SparkContext): Boolean =
    try { sc.listenerBus.waitUntilEmpty(); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}

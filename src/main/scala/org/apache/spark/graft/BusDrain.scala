package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge to `SparkContext.listenerBus` (`private[spark]`): lets dev
  * tooling wait until every queued listener event has been DELIVERED
  * before reading state its listeners accumulate. [[graft.ProfileQuery]]
  * used a fixed 2 s sleep here — on a loaded box late
  * `SparkListenerJobEnd` events were silently dropped from the emitted
  * per-job profile, which is the evidence surface the tool exists to
  * produce (r17 ADVICE). Same single-purpose-accessor doctrine as
  * [[org.apache.spark.sql.graft]]: this package hosts only bridges this
  * repo wrote, never copied engine code. */
object BusDrain {
  /** Block until the listener bus is empty or `timeoutMs` elapses.
    * Returns true when fully drained. */
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}

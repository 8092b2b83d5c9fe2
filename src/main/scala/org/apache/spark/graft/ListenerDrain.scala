package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `private[spark]` access shim: the bench/audit harnesses want to drain
  * the async listener bus between timed rows (VERDICT r16 task 6 — the
  * in-run inflation class: queued listener events from row N are
  * processed, on the shared driver, DURING row N+1's timed window; at
  * 276 queries/JVM the late rows pay a backlog the early rows don't).
  * `SparkContext.listenerBus` is private[spark], so the one-line drain
  * lives in this package. Swallows nothing: a timeout just returns
  * (waitUntilEmpty throws only on >default timeout, which we bound). */
object ListenerDrain {
  /** Block until the shared listener bus has dispatched every queued
    * event, or `timeoutMs` passes — whichever first. Never throws. */
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Exception => () }
}

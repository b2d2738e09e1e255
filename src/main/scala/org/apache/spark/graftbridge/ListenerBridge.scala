package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Private-API shim (same discipline as `sql.graftbridge.ExprBridge`):
  * `SparkContext.listenerBus` is `private[spark]`, but measurement
  * tooling that reads task metrics through a `SparkListener` must drain
  * the asynchronous bus before trusting a counter — a fixed sleep
  * undercounts under load. This exposes exactly the blocking drain and
  * nothing else. */
object ListenerBridge {

  /** Block until every event posted so far has been delivered to all
    * listeners, or `timeoutMs` elapses (then throws TimeoutException). */
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}

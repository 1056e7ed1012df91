package org.apache.spark.graftbus

import org.apache.spark.SparkContext

/** Drains the async listener bus so a [[org.apache.spark.scheduler
  * .SparkListener]]'s counters are complete before a snapshot is read.
  *
  * Task-end events are delivered asynchronously: without a flush, the
  * last tasks of a just-finished action may not have reached the
  * listener yet and a metrics delta taken "after" the action would
  * under-count it (and over-count the next one). `LiveListenerBus
  * .waitUntilEmpty` is the exact drain primitive Spark's own test
  * harness uses; it is `private[spark]`, hence this one-method shim in
  * a spark subpackage. Bench-harness-only — never on a query path. */
object BusFlush {
  /** Block until every queued listener event is delivered (10 s cap
    * inside Spark). Best-effort: a timeout degrades one sample's
    * metrics, not the run. */
  def flush(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}

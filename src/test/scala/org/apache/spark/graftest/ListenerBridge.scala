package org.apache.spark.graftest

import org.apache.spark.SparkContext

/** Test-side access bridge for `private[spark]` scheduler internals
  * (the graftext.Bridge technique, scoped to the test classpath).
  * The one consumer is deterministic listener-metric assertions:
  * task-end events reach `SparkListener`s through an ASYNC bus, so a
  * test that reads a listener-fed counter right after `collect()`
  * races the drain — and polling with a timeout both mis-attributes
  * late events from a previous query and makes genuinely quiet
  * queries pay the full timeout. `flush` blocks until every queued
  * event has been delivered, which is exactly the barrier Spark's own
  * metrics suites use.
  */
object ListenerBridge {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

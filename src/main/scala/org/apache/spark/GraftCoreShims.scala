package org.apache.spark

/** Bridge to the `private[spark]` listener bus, for deterministic
  * metric reads in the benchmark harness: task-end events are
  * delivered asynchronously, so per-query shuffle-byte attribution
  * must drain the bus before snapshotting counters. Same
  * extension-library pattern as GraftSqlShims; no Spark internals are
  * modified.
  */
object GraftCoreShims {
  /** Block until every queued listener event has been delivered. */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

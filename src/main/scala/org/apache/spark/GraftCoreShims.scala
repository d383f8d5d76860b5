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

  /** Synchronously drop every registered shuffle's files. The normal
    * path is ContextCleaner, but it is ASYNC (GC-triggered, background
    * thread): a benchmark loop that runs shuffle-heavy queries
    * back-to-back can write new shuffle files faster than the cleaner
    * reclaims the old ones — the r13 100× sweep accumulated ~70 GB
    * across three q_ngram_containment_prefix runs and filled the
    * disk. Safe ONLY between jobs (a running job's shuffle must not
    * be dropped); the bench calls it after each timed sample.
    */
  def dropAllShuffles(sc: SparkContext): Unit = {
    val tracker = sc.env.mapOutputTracker
      .asInstanceOf[MapOutputTrackerMaster]
    val ids = tracker.shuffleStatuses.keySet.toSeq
    ids.foreach { id =>
      sc.cleaner.foreach(_.doCleanupShuffle(id, blocking = true))
    }
  }
}

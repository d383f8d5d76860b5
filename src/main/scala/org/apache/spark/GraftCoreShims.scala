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
    * disk. PRECONDITIONS (asserted here): no job may be running (a
    * live job's shuffle must not be dropped), and no cached/memoized
    * DataFrame whose lineage spans the drop may be re-executed
    * afterwards — it would fail on missing shuffle files. The bench
    * satisfies both: it calls this only between timed samples, and no
    * frame's lineage crosses a sample boundary. Not a general-purpose
    * API.
    */
  def dropAllShuffles(sc: SparkContext): Unit = {
    require(sc.statusTracker.getActiveJobIds().isEmpty,
      "dropAllShuffles with active jobs: a running job's shuffle " +
        "files must not be dropped — call only between jobs")
    if (sc.cleaner.isEmpty) {
      // referenceTracking=false ⇒ no ContextCleaner: the drop would
      // silently no-op while the caller believes disk was reclaimed
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "dropAllShuffles: spark.cleaner.referenceTracking is " +
          "disabled (sc.cleaner is None) — shuffle files were NOT " +
          "dropped; the caller's disk-pressure assumption fails")
      return
    }
    val tracker = sc.env.mapOutputTracker
      .asInstanceOf[MapOutputTrackerMaster]
    val ids = tracker.shuffleStatuses.keySet.toSeq
    ids.foreach { id =>
      sc.cleaner.foreach(_.doCleanupShuffle(id, blocking = true))
    }
  }
}

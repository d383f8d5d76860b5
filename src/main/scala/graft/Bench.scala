package graft
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.GraftCoreShims
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR (default sf0.1), local[32].
  *
  * Writes the full result JSON (per-query median seconds, per-query
  * `[min, median, max]` run spread — a contended line self-identifies
  * as max/min ≥ ~2 right in the artifact — per-query
  * shuffle read/write bytes, and before/after machine-load context — wall-time saturated the baseline rounds
  * ago; shuffle volume is the signal that catches O(n²) candidate
  * growth in the LSH paths before wall-time does) to a file
  * (SPARK_GRAFT_BENCH_OUT, default ./BENCH_OUT.json) and stdout, then
  * prints a SHORT summary JSON line LAST: the driver keeps only the
  * tail of the log, and the full line has outgrown it (r4/r5 both
  * recorded parsed:null from a head-truncated line). A failing query
  * FAILS the run (non-zero exit) — round 1 recorded broken queries as
  * fast successes.
  *
  * Optional args: query names to run (subset, for local iteration),
  * or `--headline` for the fixed ~40-query tier below — the
  * per-commit loop's budget-bounded run (the full 182-query suite is
  * ~6 min of wall-clock and grows linearly with the surface; the
  * driver's per-round artifact stays the full run).
  */
object Bench {

  /** The headline tier: every query that has ever exceeded ~1 s at
    * sf0.1 (the only ones whose regressions are distinguishable from
    * box noise), plus one cheap anchor per family whose plan shape is
    * pinned against a scale claim (flagship agg, streaming replay,
    * shuffle-free sampling, exchange-free ANN). Ordered here by r10
    * cost, descending — KEEP sorted when adding.
    */
  val Headline: Seq[String] = Seq(
    "q_triangle_count", "q_weighted_quantiles", "q_kcore",
    "q_rm3_search", "q_quality_model", "q_mmr_rerank", "q_pagerank",
    "q_copurchase", "q_also_bought", "q_asof_forward", "q_corr_exact",
    "q_rank_eval", "q_dsir_weights", "q_hybrid_search",
    "q_quantile_bin", "q_table_checksum", "q_dsir_select",
    "q_boilerplate_strip", "q_knn_ivfpq", "q_lm_score",
    "q_skyline_lineitem", "q_bm25_search", "q_ngram_jaccard_pairs",
    "q_semdedup", "q_lm_buckets", "q_ngram_jaccard_prefix",
    "q_weighted_sample", "q_corpus_drift", "q_doc_bm25",
    "q_minhash_lsh", "q_dedup_corpus", "q_daily_load",
    "q5_local_supplier_volume", "q_funnel_latency", "q_kmeans_assign",
    "q_doc_neardup_clusters", "q_gap_fill", "q_ingest_replay",
    "q_snapshot_diff", "q_top_paths",
    // round-11 additions over the ~1 s line
    "q_mad_outliers", "q_winsorized_mean", "q_feature_scale",
    "q_audio_features", "q_pareto_share", "q_temporal_split",
    "q_doc_keywords", "q_chi_square", "q_negative_samples",
    "q_basket_pmi",
    // round-12 additions over the ~1 s line (media pipelines +
    // containment; ordered by r12 sweep cost, descending). BOTH
    // containment forms are tracked: the direct one is the documented
    // quadratic verification twin, the prefix one is the shipped
    // scale path — monitoring only the twin left the fix path's
    // regression behavior unwatched (r12 advice)
    "q_video_features", "q_video_frames", "q_image_neardup",
    "q_image_dedup_clusters", "q_ngram_containment",
    "q_ngram_containment_prefix", "q_audio_windows",
    "q_image_phash", "q_linreg",
    // round-13 additions over the ~1 s line: the streaming gates,
    // the audio fingerprint family (WAV synth+decode dominates),
    // and the cross-modality manifest composition
    "q_multimodal_manifest", "q_multimodal_ingest",
    "q_audio_neardup", "q_audio_ingest_gate",
    "q_audio_fingerprint", "q_image_ingest_gate", "q_video_neardup",
    "q_video_ingest_gate",
    // cheap plan-shape anchors
    "q1_lineitem_agg", "q_events_hourly", "q_knn_sq8")

  /** A per-query run spread self-identifies as contended when
    * max/min ≥ this ratio — the empirical threshold from three rounds
    * of adjudicated driver-box spikes (r10 triangle ×13, r12 k-core
    * ×16): real per-query regressions moved the WHOLE spread, never
    * one isolated sample.
    */
  val ContentionRatio: Double = 2.0

  /** Extra trials granted to a contended line, so an isolated
    * contention spike cannot become the median of record (three
    * r12 medians — q_kcore 26.9 s, q_copurchase, q_calibration —
    * absorbed a mid-run episode that the judge then had to
    * re-adjudicate by hand).
    */
  val MaxExtraRuns: Int = 2

  /** Extra trials for a contended HEAVY line (best sample above
    * [[HeavyTierSec]]): with only runs+2 samples, one sustained
    * episode can still shift the lower-middle median of a >5 s line
    * by whole seconds (r13: 38 driver lines self-flagged even after
    * the retry pass), so heavy lines buy two more trials. The tier
    * tests the spread MINIMUM — the least-contaminated estimate of
    * the line's true cost (a contended median may itself be the
    * spike).
    */
  val MaxExtraRunsHeavy: Int = 4

  /** Boundary between the cheap and heavy retry tiers, seconds. */
  val HeavyTierSec: Double = 5.0

  /** True when a run spread self-identifies as contended. A single
    * sample carries no spread, so it can never be flagged.
    */
  def isContended(timings: Seq[Double]): Boolean =
    timings.size >= 2 &&
      timings.max(Ordering.Double.TotalOrdering) /
        timings.min(Ordering.Double.TotalOrdering) >= ContentionRatio

  /** Self-healing sample loop: `runs` base samples, then — if the
    * spread is contended — [[MaxExtraRuns]] extra trials
    * ([[MaxExtraRunsHeavy]] when the spread minimum clears
    * [[HeavyTierSec]]), and the caller medians over ALL samples. The
    * extras cannot shrink the recorded max/min (a spike stays in the
    * spread, which is the point: the artifact still shows contention
    * happened), but with the extra samples one spike can no longer BE
    * the lower-middle median of record. Factored from the timed loop
    * so the retry policy is unit-testable without a Spark session.
    */
  def sampleWithRetry[A](runs: Int, sample: () => (Double, A)): Vector[(Double, A)] = {
    val base = Vector.fill(runs)(sample())
    val t = base.map(_._1)
    if (isContended(t)) {
      val extra =
        if (t.min(Ordering.Double.TotalOrdering) > HeavyTierSec)
          MaxExtraRunsHeavy
        else MaxExtraRuns
      base ++ Vector.fill(extra)(sample())
    } else base
  }

  /** Accumulates shuffle bytes across task-end events; reset per
    * query, snapshot after draining the listener bus.
    */
  private final class ShuffleListener extends SparkListener {
    val read = new AtomicLong(0L)
    val write = new AtomicLong(0L)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def reset(): Unit = { read.set(0L); write.set(0L) }
  }

  /** Machine-load snapshot — 1/5/15-min loadavg plus the number of
    * OTHER live JVMs on the box. Captured before and after the timed
    * loop and recorded in the artifact, so a contended run is
    * machine-identifiable from the JSON alone: r9's driver artifact
    * disagreed with the same-commit builder run by 50% (137.9 s vs
    * 92.1 s) and the contention explanation had to be reconstructed
    * from per-query forensics after the fact.
    */
  private def envSnapshot(): String = {
    val load =
      try Files.readString(Paths.get("/proc/loadavg")).trim
        .split("\\s+").take(3).mkString(",")
      catch { case _: Exception => "-1,-1,-1" }
    val jvms =
      try {
        import scala.jdk.CollectionConverters._
        Files.list(Paths.get("/proc")).iterator().asScala.count { p =>
          p.getFileName.toString.forall(_.isDigit) && {
            val comm = p.resolve("comm")
            try Files.readString(comm).trim == "java"
            catch { case _: Exception => false }
          }
        }
      } catch { case _: Exception => -1 }
    s"""{"loadavg":[$load],"java_procs":$jvms,""" +
      s""""cpus":${Runtime.getRuntime.availableProcessors}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json")
    // shuffle partitions track the core count by default; the scaling
    // sweeps override this upward (a cluster sizes partitions to the
    // DATA — pinning 32 at 100× the volume measures spill crossover,
    // not the operator; PLANS_r11 §4a)
    val shuffleParts = sys.env
      .getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus).toInt
    val spark =
      GraftSession.builder(s"local[$cpus]", shuffleParts).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.sameElements(Array("--headline"))) {
        val missing = Headline.filterNot(SparkEntry.queries.contains)
        require(missing.isEmpty, s"headline names gone: $missing")
        Headline
      }
      else if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // untimed warmup: session/codegen/shuffle-machinery startup AND the
    // cold first read of every sf-dir table (OS page cache + parquet
    // footers) must not be billed to whichever query runs first — round
    // 2 billed the cold sf0.1 read to q1, the alphabetical leader
    spark.range(1000).selectExpr("sum(id)").count()
    SparkEntry.entry(spark).count()
    // noop-write, not count(): count() compiles to a metadata-only
    // parquet scan that never touches the heavy text/embedding columns,
    // so the first text query was still billed ~2.5 s of cold column
    // read (round 3 billed it to q_dedup_corpus, the alphabetical
    // leader among text queries)
    Tables.all.foreach(n =>
      Tables.loaders(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save())
    SparkEntry.warmFixtures(spark, sfDir) // one-time fixtures, untimed
    // JMH-style JVM warmup: run every benched query once at the tiny
    // warm dir, untimed. Spark's codegen cache keys on generated-code
    // TEXT (paths live in scan metadata, not the generated class), so
    // this pre-compiles ~all generated operators for the timed loop —
    // round 3 billed ~3 s of one-time Janino+C2 compilation to
    // whichever query first touched each pipeline family.
    val warmDir = sys.env.getOrElse(
      "SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (warmDir != sfDir && Files.isDirectory(Paths.get(warmDir))) {
      SparkEntry.warmFixtures(spark, warmDir)
      names.foreach { n =>
        SparkEntry.queries(n)(spark, warmDir)
          .write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
      }
    }
    spark.catalog.clearCache()
    System.gc()
    val shuffle = new ShuffleListener
    spark.sparkContext.addSparkListener(shuffle)
    // median-of-Runs per query: a single sample on a shared box showed
    // 2.5-3.5x phantom regressions in the round-6 tracked artifact
    // (disproven on re-run); the median absorbs one bad sample while
    // still letting a real regression through
    val Runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    require(Runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $Runs")
    val envBefore = envSnapshot()
    val results = names.map { name =>
      // stderr progress marker: ties any mid-run failure (OOM, disk
      // full) to the query that caused it — the r13 100× sweep died
      // with only a bare stack trace and cost a full re-run to locate
      // the disk that matters is where SHUFFLE/SPILL files land;
      // mirror Utils.getConfiguredLocalDirs precedence — the
      // SPARK_LOCAL_DIRS env var OVERRIDES the spark.local.dir conf —
      // so the marker reports the volume Spark actually spills to
      // (first entry of a comma list), falling back to tmpdir
      val spillDir = sys.env.get("SPARK_LOCAL_DIRS")
        .getOrElse(spark.sparkContext.getConf
          .get("spark.local.dir", System.getProperty("java.io.tmpdir")))
        .split(',').head
      System.err.println(f"[bench] $name disk_free_gb=${
        new java.io.File(spillDir).getUsableSpace / 1e9}%.1f" +
        s" spill_dir=$spillDir")
      val fn = SparkEntry.queries(name)
      def sample(): (Double, (Long, Long)) = {
        // induction queries re-train EVERY sample (the memo would turn
        // the median into a cache-hit timing); apply queries keep the
        // memo — they score with already-induced artifacts by design
        if (name == "q_quality_model" || name == "q_bpe_vocab")
          SparkEntry.clearInductionMemos(sfDir)
        shuffle.reset()
        val t0 = System.nanoTime()
        // noop-write, NOT count(): count() lets Catalyst prune every
        // column and even eliminate row-preserving joins (a left join
        // against an aggregate on the join key is provably 1:1 and
        // gets removed), so a map-shaped query "benches" as a
        // metadata-only parquet count — q_substring_dedup timed 0.25 s
        // with 59 shuffle bytes that way. The noop sink materializes
        // every output column through the full plan, which is what a
        // real consumer pays.
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // task-end events are async; drain before snapshotting so each
        // query's shuffle bytes land on the query that caused them
        GraftCoreShims.drainListenerBus(spark.sparkContext)
        val sh = (shuffle.read.get(), shuffle.write.get())
        // queries persist intermediate signature tables; drop them so
        // timings stay independent, and nudge GC so one query's garbage
        // is not billed to the next
        spark.catalog.clearCache()
        System.gc()
        // shuffle files are reclaimed by the ASYNC ContextCleaner,
        // which can lag a loop of shuffle-heavy queries until the
        // disk fills (the r13 100× sweep died this way) — drop them
        // synchronously; no job is running between samples
        GraftCoreShims.dropAllShuffles(spark.sparkContext)
        (dt, sh)
      }
      // self-healing against contention spikes: a contended base
      // spread earns MaxExtraRuns extra trials and the median of
      // record is over ALL samples — r12 shipped three medians that
      // were themselves the spike
      val samples = sampleWithRetry(Runs, () => sample())
      // shuffle bytes travel with the median run's sample so the pair
      // stays internally consistent (bytes are deterministic anyway).
      // Lower-middle for even run counts: noise on a shared box is
      // strictly additive, so between the two middles the faster one
      // is the better estimate (Runs=2 would otherwise record the MAX)
      val sorted = samples.sortBy(_._1)(Ordering.Double.TotalOrdering)
      val (dt, sh) = sorted((samples.size - 1) / 2)
      // full [min, median, max] run spread rides in the artifact: a
      // max/min ratio ≥ ~2 self-identifies a contended line from the
      // JSON alone, instead of costing a judge/builder re-measure
      // cycle (r10's 162 s and r11's 12.3 s triangle lines both did)
      (name, dt, sh, sorted.head._1, sorted.last._1)
    }
    // lines whose final spread still self-identifies as contended —
    // the retry cannot remove a spike from min/max (by design), so
    // this is exactly "contention happened here; the median of record
    // absorbed MaxExtraRuns extra trials"
    val contendedNames = results.collect {
      case (k, _, _, mn, mx) if isContended(Seq(mn, mx)) => k }
    val contendedJson =
      contendedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val sh = results.map { case (k, _, (r, w), _, _) =>
      "\"" + k + s"""\":{"read":$r,"write":$w}""" }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, med, _, mn, mx) =>
      "\"" + k + f"""\":[$mn%.3f,$med%.3f,$mx%.3f]""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val envAfter = envSnapshot()
    val full =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$Runs,"contended":$contendedJson,"queries":$qs,"spread":$spread,"shuffle_bytes":$sh,"env_before":$envBefore,"env_after":$envAfter,"sf":"$sfDir"}"""
    println(full)
    Files.writeString(Paths.get(out), full + "\n")
    // the contract-format line goes LAST on both streams AND must fit
    // the driver's 2000-char tail window with ~80 chars of sbt footer
    // after it: r3–r5 all recorded parsed:null because the all-queries
    // line is ~2100 chars and still growing every round. The line
    // keeps the contract schema but carries the SLOWEST `TopN` queries
    // (full names, 2-decimal seconds) — the hot-spot signal the
    // per-query map exists for; the fast tail and shuffle bytes live
    // in full fidelity in BENCH_OUT.json (committed with the round).
    val TopN = 48
    val top = results.sortBy(-_._2).take(TopN)
    val qsShort = top.map { case (k, v, _, _, _) => "\"" + k + f"\":$v%.2f" }
      .mkString("{", ",", "}")
    val sfLabel = Paths.get(sfDir).getFileName.toString
    val contract =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec",""" +
        f""""n_queries":${results.size},"runs":$Runs,""" +
        f""""contended":$contendedJson,"queries":$qsShort,""" +
        f""""full":"$out","sf":"$sfLabel"}"""
    println(contract)
    System.err.println(contract)
    spark.stop()
  }
}

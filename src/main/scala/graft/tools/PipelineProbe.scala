package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.dedup.Dedup

/** Measurement probe for the containment pipeline-ordering claim
  * (VERDICT r14 Next #2a): on a given corpus directory, count the
  * containment prefix filter's CANDIDATE pairs on the raw corpus and
  * on the pipeline's collapsed corpus (exact dedup + MinHash-LSH
  * near-dup collapse — [[Dedup.containmentPipeline]]'s first two
  * stages), and report the reduction with per-stage wall times as one
  * JSON line. Run per sweep tier by `scripts/run_sweep.sh`, recorded
  * in the round's PLANS table — the number that turns "run the
  * collapse stages first on template-heavy corpora" from prose into
  * evidence.
  *
  * Usage: runMain graft.tools.PipelineProbe <sfDir>
  */
object PipelineProbe {

  def main(args: Array[String]): Unit = {
    require(args.length == 1 || args.length == 2,
      "usage: PipelineProbe <sfDir> [shufflePartitions]")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shuffle partitions are the documented scale knob of the shuffled
    // prefix join — the sweep passes each tier's partition count so the
    // probe's plan matches the tier's bench run (ADVICE r15: probing
    // 100x at the 1x partition count measured spill, not the operator)
    val parts =
      if (args.length == 2) args(1).toInt else cpus.toInt
    val spark: SparkSession =
      GraftSession.builder(s"local[$cpus]", parts).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs = Tables.documents(spark, dir)
    val nRaw = docs.count()
    val (candRaw, tCandRaw) = timed(
      Dedup.containmentPrefixCandidateCount(docs, "doc_id", "text", 3, 0.8))
    spark.catalog.clearCache()
    // the pipeline's collapse stages, checkpointed so the second
    // candidate count prices ONLY the prefix filter on survivors
    val (surv, tCollapse) = timed {
      val exKeeps = Dedup.exactDedup(docs, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      Dedup.dedupCorpus(
          docs.join(exKeeps, Seq("doc_id"), "left_semi"),
          "doc_id", "text")
        .localCheckpoint()
    }
    spark.catalog.clearCache()
    val nSurv = surv.count()
    val (candSurv, tCandSurv) = timed(
      Dedup.containmentPrefixCandidateCount(surv, "doc_id", "text", 3, 0.8))
    // zero collapsed candidates → null, not NaN: NaN is not a JSON
    // literal and breaks any consumer of the artifact (ADVICE r15)
    val reduction =
      if (candSurv > 0) f"${candRaw.toDouble / candSurv}%.2f" else "null"
    println(s"""{"probe":"containment_pipeline","dir":"$dir"""" +
      s""","docs_raw":$nRaw,"docs_collapsed":$nSurv""" +
      s""","cand_raw":$candRaw,"cand_collapsed":$candSurv""" +
      s""","cand_reduction":$reduction""" +
      f""","sec_cand_raw":$tCandRaw%.1f,"sec_collapse":$tCollapse%.1f""" +
      f""","sec_cand_collapsed":$tCandSurv%.1f}""")
    spark.stop()
  }
}

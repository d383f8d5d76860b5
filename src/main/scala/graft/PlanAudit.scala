package graft
import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints `explain("formatted")` for the named
  * queries (default: a representative set) so scan pruning
  * (ReadSchema), filter pushdown (PushedFilters), join strategy
  * (BroadcastHashJoin vs SortMergeJoin), top-k (TakeOrderedAndProject)
  * and WholeStageCodegen spans can be eyeballed per round.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_membership_level", "q_point_lookup", "q_top5_sales",
        "q_derived_columns", "q_knn_bruteforce", "q_daily_load",
        "q_sync_delete_antijoin", "q_doc_token_stats", "q_rollup",
        "q_doc_tfidf", "q_events_sessions", "q_minhash_lsh",
        "q_asof_join", "q_range_join", "q_sample_hash", "q_pivot",
        "q_json_extract", "q_top_ngrams")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

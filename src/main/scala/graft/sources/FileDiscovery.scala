package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** S9 — modified-file discovery: the reference's hourly jobs source
  * only files whose mtime falls inside the last hour
  * (`airflow/dags/POS_spark_dag.py:66–79`, `os.path.getmtime` window).
  *
  * Through the Hadoop FileSystem API so it works on any Spark-visible
  * storage, not just the local FS. This is the incremental-batch CDC
  * trigger; the streaming-native equivalent is the file stream source /
  * `Trigger.AvailableNow` (see [[graft.streaming.Ingest]]), which
  * tracks processed files in the checkpoint instead of trusting
  * mtimes.
  */
object FileDiscovery {

  /** Files in `dir` (non-recursive, like the reference) modified at or
    * after `cutoffMillis`, sorted for deterministic downstream unions.
    */
  def modifiedSince(
      spark: SparkSession, dir: String, cutoffMillis: Long): Seq[String] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(s => s.isFile && s.getModificationTime >= cutoffMillis)
      .map(_.getPath.toString)
      .sorted
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite; UTC + small shuffle partitions
  * to mirror the driver's Verify/Bench configuration.
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // the deployment registration path — specs call the functions via
    // spark.sql without a register() step
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  def sfDir: String = "/root/testdata/sf0.001"

  /** Shared golden-fixture compare for deterministic no-oracle queries
    * with mixed-type output (BpeSpec, QualityModelSpec; the numeric
    * CSV goldens predate this and live in GoldenSpec): the query's
    * full sf0.01 result set against a committed TSV resource. Cells
    * parse as doubles when possible — double repr round-trips, so the
    * comparison is repr-independent — and compare as strings
    * otherwise. Tokens are `\S+` runs, so tab never occurs in a cell.
    */
  def checkGoldenTsv(name: String): Unit = {
    def cell(s: String): Any =
      try java.lang.Double.valueOf(s.toDouble)
      catch { case _: NumberFormatException => s }
    val in = getClass.getResourceAsStream(s"/golden/${name}_sf0.01.tsv")
    assert(in != null, s"missing golden fixture for $name")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val want =
      try src.getLines().drop(1).map(_.split('\t').map(cell).toSeq).toSet
      finally src.close()
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    val got = df.collect()
      .map(r => (0 until r.length)
        .map(i => cell(String.valueOf(r.get(i)))): Seq[Any])
      .toSet
    assert(got == want,
      s"$name drifted from golden fixture: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)} " +
        s"(${got.size} vs ${want.size} rows)")
    spark.catalog.clearCache()
  }
}

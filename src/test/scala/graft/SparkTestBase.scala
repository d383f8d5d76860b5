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
}

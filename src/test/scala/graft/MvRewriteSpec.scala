package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.ops.AggMaintain
import graft.plans.MvRewrite

/** Pins for the materialized-view rewrite rule: it must fire on the
  * exact registered shape (and then read ONLY the state files), must
  * produce the identical result and schema, and must refuse every
  * shape whose semantics the state cannot answer.
  */
class MvRewriteSpec extends SparkTestBase {

  private val factPath = s"$sfDir/lineitem.parquet"
  private lazy val stateRoot = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_mv_spec"
    val li = spark.read.parquet(factPath)
      .select("l_orderkey", "l_returnflag", "l_quantity")
    val state = (0 to 2).map(i => AggMaintain.partial(
        li.filter(pmod(col("l_orderkey"), lit(3)) === i),
        Seq("l_returnflag"), "l_quantity"))
      .reduce((a, b) => AggMaintain.merge(a, b, Seq("l_returnflag")))
    state.coalesce(1).write.mode("overwrite").parquet(root)
    MvRewrite.register(spark, factPath,
      Seq("l_returnflag"), "l_quantity", root,
      acceptTwoDecimalRounding = true)
    root
  }

  private def fact: DataFrame = {
    stateRoot // force registration
    spark.read.parquet(factPath)
  }

  private def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation
          if lr.relation.isInstanceOf[HadoopFsRelation] =>
        lr.relation.asInstanceOf[HadoopFsRelation]
          .location.rootPaths.map(_.toString)
    }.flatten

  private def readsState(df: DataFrame): Boolean = {
    val p = scannedPaths(df)
    p.exists(_.contains("graft_mv_spec")) &&
      !p.exists(_.contains("lineitem.parquet"))
  }

  private def matchedShape: DataFrame = fact
    .groupBy("l_returnflag")
    .agg(count(lit(1)).as("n"),
      sum("l_quantity").as("s"),
      min("l_quantity").as("mn"),
      max("l_quantity").as("mx"))

  test("rewrite fires on the registered shape and reads only state") {
    assert(readsState(matchedShape))
  }

  test("rewritten result and schema are identical to the direct plan") {
    val direct = spark.read.parquet(factPath)
      // an always-true-on-data (but not foldable) filter above the
      // scan vetoes the rewrite, so this plan is guaranteed to be the
      // raw recompute
      .filter(col("l_quantity") >= 0)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum("l_quantity").as("s"),
        min("l_quantity").as("mn"),
        max("l_quantity").as("mx"))
    val got = matchedShape.collect().map(_.toSeq).toSet
    val want = direct.collect().map(_.toSeq).toSet
    assert(!readsState(direct))
    assert(matchedShape.schema == direct.schema.copy())
    assert(got == want)
  }

  test("rewrite survives downstream operators re-resolving its output") {
    val downstream = matchedShape
      .filter(col("n") > 0)
      .select(col("l_returnflag"), (col("s") / col("n")).as("avg_qty"))
    assert(readsState(downstream))
    assert(downstream.collect().length ==
      matchedShape.select("l_returnflag").distinct().count())
  }

  test("must NOT fire: filter between aggregate and scan") {
    val df = fact.filter(col("l_quantity") > 10)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
    assert(!readsState(df))
  }

  test("avg FIRES, finished as sum_v / n at rewrite time") {
    val df = fact.groupBy("l_returnflag")
      .agg(avg("l_quantity").as("a"), count(lit(1)).as("n"))
    assert(readsState(df))
    val direct = spark.read.parquet(factPath)
      .filter(col("l_quantity") >= 0) // vetoes the rewrite (see above)
      .groupBy("l_returnflag")
      .agg(avg("l_quantity").as("a"), count(lit(1)).as("n"))
    assert(!readsState(direct))
    assert(df.schema == direct.schema.copy())
    assert(df.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
  }

  test("must NOT fire: avg with a DECIMAL result type") {
    // a decimal-typed avg has engine-specific result scale; the
    // finish only covers double-result avgs
    fact.createOrReplaceTempView("mv_spec_li_dec")
    val df = spark.sql(
      """SELECT l_returnflag,
         avg(CAST(l_quantity AS DECIMAL(12,2))) AS a
         FROM mv_spec_li_dec GROUP BY l_returnflag""")
    assert(!readsState(df))
  }

  test("must NOT fire: aggregate over a different value column") {
    val df = fact.groupBy("l_returnflag")
      .agg(sum("l_extendedprice").as("s"))
    assert(!readsState(df))
  }

  test("must NOT fire: different grouping keys") {
    val sub = fact.groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("s"))
    val sup = fact.groupBy().agg(sum("l_quantity").as("s"))
    assert(!readsState(sub) && !readsState(sup))
  }

  test("must NOT fire: DISTINCT aggregate") {
    val df = fact.groupBy("l_returnflag")
      .agg(countDistinct("l_quantity").as("n"))
    assert(!readsState(df))
  }

  test("must NOT fire: FILTER clause on the aggregate") {
    fact.createOrReplaceTempView("mv_spec_lineitem")
    val df = spark.sql(
      """SELECT l_returnflag,
         sum(l_quantity) FILTER (WHERE l_quantity > 5) AS s
         FROM mv_spec_lineitem GROUP BY l_returnflag""")
    assert(!readsState(df))
  }

  test("must NOT fire: count of a NULL literal (correct answer is 0)") {
    val df = fact.groupBy("l_returnflag")
      .agg(count(lit(null)).as("n"))
    assert(!readsState(df))
    assert(df.collect().forall(_.getLong(1) == 0L))
  }

  test("registration refuses a float value column without the 2-dp flag") {
    val ex = intercept[IllegalArgumentException] {
      MvRewrite.register(spark, factPath,
        Seq("l_returnflag"), "l_extendedprice", stateRoot)
    }
    assert(ex.getMessage.contains("acceptTwoDecimalRounding"))
  }

  test("must NOT fire: unregistered fact table") {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(!readsState(df))
  }
}

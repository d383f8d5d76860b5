package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.jobs.{DailyLoadJob, HourlySyncJob}
import graft.sinks.{DeleteInsertUpsertDialect, JdbcUpsertSink, PostgresUpsertDialect}
import graft.sources.JdbcSource

/** JDBC source + sink + job composition against an embedded Derby
  * warehouse (the sandbox has no Postgres; Derby exercises the same
  * JDBC code paths with the portable delete+insert upsert dialect —
  * the Postgres ON CONFLICT dialect is covered by SQL-text tests).
  */
class JdbcSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDb(name: String): String =
    s"jdbc:derby:memory:$name;create=true"

  private def exec(url: String, sqls: String*): Unit = {
    val c = DriverManager.getConnection(url)
    try sqls.foreach { s => val st = c.createStatement(); try st.execute(s) finally st.close() }
    finally c.close()
  }

  private def queryPairs(url: String, sql: String): Set[(Int, String, Double)] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(sql)
      val buf = scala.collection.mutable.Set[(Int, String, Double)]()
      while (rs.next()) buf += ((rs.getInt(1), rs.getString(2), rs.getDouble(3)))
      buf.toSet
    } finally c.close()
  }

  test("JdbcSource.read snapshots a warehouse table (S3)") {
    val url = freshDb("snap")
    exec(url,
      "CREATE TABLE sales (sale_id INT PRIMARY KEY, name VARCHAR(32), amt DOUBLE)",
      "INSERT INTO sales VALUES (1, 'a', 10.0), (2, 'b', 20.0)")
    val got = JdbcSource.read(spark, url, "sales")
      .select("SALE_ID", "NAME", "AMT")
      .as[(Int, String, Double)].collect().toSet
    assert(got == Set((1, "a", 10.0), (2, "b", 20.0)))
  }

  test("JdbcSource.read with range partitioning splits into parallel reads (S3 scale path)") {
    val url = freshDb("part")
    exec(url,
      "CREATE TABLE t (id INT PRIMARY KEY, name VARCHAR(32), amt DOUBLE)",
      "INSERT INTO t VALUES " +
        (1 to 40).map(i => s"($i, 'n$i', $i.0)").mkString(", "))
    val df = JdbcSource.read(spark, url, "t",
      partitioning = Some(JdbcSource.RangePartitioning("id", 1L, 41L, 4)))
    assert(df.rdd.getNumPartitions == 4, "4 range-predicated JDBC partitions")
    assert(df.count() == 40, "partition predicates must not drop or duplicate rows")
    assert(df.select("ID").as[Int].collect().sorted.toSeq == (1 to 40))
  }

  test("HourlySyncJob.syncTable: warehouse becomes exactly the fresh extract (M1+M2+M3)") {
    val url = freshDb("sync")
    exec(url,
      "CREATE TABLE sales (sale_id INT PRIMARY KEY, name VARCHAR(32), amt DOUBLE)",
      // 1 stays unchanged, 2 gets edited, 3 must be deleted
      "INSERT INTO sales VALUES (1, 'a', 10.0), (2, 'b', 20.0), (3, 'c', 30.0)")
    val fresh = Seq((1, "a", 10.0), (2, "b2", 25.0), (4, "d", 40.0))
      .toDF("sale_id", "name", "amt")
    new HourlySyncJob(url, dialect = DeleteInsertUpsertDialect)
      .syncTable(spark, "sales", "sale_id", fresh)
    val got = queryPairs(url, "SELECT sale_id, name, amt FROM sales")
    assert(got == Set((1, "a", 10.0), (2, "b2", 25.0), (4, "d", 40.0)))
  }

  test("syncTable snapshotScope: rows outside the synced scope survive (SURVEY §7.4.3)") {
    val url = freshDb("scope")
    exec(url,
      "CREATE TABLE sales (sale_id INT PRIMARY KEY, name VARCHAR(32), amt DOUBLE)",
      // 1–2 belong to the 'a*' scope being synced; 3 is another scope's
      // row that the fresh extract cannot speak for
      "INSERT INTO sales VALUES (1, 'a1', 10.0), (2, 'a2', 20.0), (3, 'b1', 30.0)")
    val fresh = Seq((1, "a1", 11.0)).toDF("sale_id", "name", "amt")
    new HourlySyncJob(url, dialect = DeleteInsertUpsertDialect)
      .syncTable(spark, "sales", "sale_id", fresh,
        snapshotScope = Some(col("name").startsWith("a")))
    val got = queryPairs(url, "SELECT sale_id, name, amt FROM sales")
    // parity mode would have deleted row 3; scoped mode keeps it,
    // deletes only the in-scope stale row 2, updates row 1
    assert(got == Set((1, "a1", 11.0), (3, "b1", 30.0)))
  }

  test("HourlySyncJob.runAll: one entry point drives all three syncs in " +
    "order (all_update_data, POS_spark_dag.py:417-421)") {
    val url = freshDb("runall")
    exec(url,
      "CREATE TABLE sales (sale_id INT PRIMARY KEY, customer_id INT, total_price DOUBLE)",
      "INSERT INTO sales VALUES (1, 10, 50.0), (9, 11, 999.0)", // 9 is stale
      "CREATE TABLE products (product_id INT PRIMARY KEY, product_name VARCHAR(32))",
      "INSERT INTO products VALUES (21, 'Old')",
      "CREATE TABLE customers (customer_id INT PRIMARY KEY, customer_name VARCHAR(32), " +
        "sum_purchase DOUBLE, purchase_frequency BIGINT, membership_level VARCHAR(16))")
    val freshSales = Seq((1, 10, 50.0), (2, 10, 120.0), (3, 12, 600.0))
      .toDF("sale_id", "customer_id", "total_price")
    val freshProducts = Seq((21, "Milk"), (22, "Beef"))
      .toDF("product_id", "product_name")
    val freshCustomers = Seq((10, "Ann"), (12, "Cee"), (13, "Didi"))
      .toDF("customer_id", "customer_name")

    new HourlySyncJob(url, dialect = DeleteInsertUpsertDialect)
      .runAll(spark, freshSales, freshProducts, freshCustomers)

    // sales: stale 9 deleted, 2 and 3 added
    assert(queryPairs(url, "SELECT sale_id, 'x', total_price FROM sales")
      .map(r => (r._1, r._3)) == Set(1 -> 50.0, 2 -> 120.0, 3 -> 600.0))
    // products: 21 updated, 22 added
    val prods = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement()
          .executeQuery("SELECT product_id, product_name FROM products")
        val buf = scala.collection.mutable.Set[(Int, String)]()
        while (rs.next()) buf += ((rs.getInt(1), rs.getString(2)))
        buf.toSet
      } finally c.close()
    }
    assert(prods == Set(21 -> "Milk", 22 -> "Beef"))
    // customers: enrichment must see the sales state AFTER the
    // transactions sync — Ann 170 (Silver, 2 buys), Cee 600 (Gold, 1),
    // Didi never purchased (Bronze, 0)
    val custs = {
      val c = DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(
          "SELECT customer_id, membership_level, purchase_frequency FROM customers")
        val buf = scala.collection.mutable.Set[(Int, String, Long)]()
        while (rs.next()) buf += ((rs.getInt(1), rs.getString(2), rs.getLong(3)))
        buf.toSet
      } finally c.close()
    }
    assert(custs == Set((10, "Silver", 2L), (12, "Gold", 1L), (13, "Bronze", 0L)))
  }

  test("JdbcUpsertSink.upsert is idempotent (retry-safe)") {
    val url = freshDb("idem")
    exec(url,
      "CREATE TABLE t (id INT PRIMARY KEY, name VARCHAR(32), amt DOUBLE)")
    val rows = Seq((1, "x", 1.0), (2, "y", 2.0)).toDF("id", "name", "amt")
    val sink = new JdbcUpsertSink(url, "t", Seq("id"),
      dialect = DeleteInsertUpsertDialect)
    sink.upsert(rows)
    sink.upsert(rows) // re-run must not duplicate or fail
    val got = queryPairs(url, "SELECT id, name, amt FROM t")
    assert(got == Set((1, "x", 1.0), (2, "y", 2.0)))
  }

  test("DailyLoadJob appends the cleaned extract; empty extract is a no-op (EP1)") {
    val url = freshDb("daily")
    exec(url,
      "CREATE TABLE sales (sale_id INT, name VARCHAR(32), amt DOUBLE)")
    val extract = Seq(
      (Some(1), Some("a"), Some(10.0)),
      (Some(1), Some("a"), Some(10.0)),          // dup → dropped
      (None: Option[Int], Some("n"), Some(1.0))) // null → dropped
      .toDF("sale_id", "name", "amt")
    assert(DailyLoadJob.run(extract, url, "sales"))
    val got = queryPairs(url, "SELECT sale_id, name, amt FROM sales")
    assert(got == Set((1, "a", 10.0)))
    val empty = extract.filter(lit(false))
    assert(!DailyLoadJob.run(empty, url, "sales"), "empty extract must be a guarded no-op")
  }

  test("Postgres dialect emits the reference's ON CONFLICT statement (M2)") {
    val Seq((sql, params)) = PostgresUpsertDialect.upsertStatements(
      "public.sales", Seq("sale_id", "name", "amt"), Seq("sale_id"))
    assert(sql ==
      "INSERT INTO public.sales (sale_id, name, amt) VALUES (?, ?, ?) " +
        "ON CONFLICT (sale_id) DO UPDATE SET name = EXCLUDED.name, amt = EXCLUDED.amt")
    assert(params == Seq("sale_id", "name", "amt"))
  }

  test("delete removes exactly the keyed rows (M1)") {
    val url = freshDb("del")
    exec(url,
      "CREATE TABLE t (id INT PRIMARY KEY, name VARCHAR(32), amt DOUBLE)",
      "INSERT INTO t VALUES (1, 'a', 1.0), (2, 'b', 2.0), (3, 'c', 3.0)")
    new JdbcUpsertSink(url, "t", Seq("id")).delete(Seq(1, 3).toDF("id"))
    val got = queryPairs(url, "SELECT id, name, amt FROM t")
    assert(got == Set((2, "b", 2.0)))
  }
}

package graft.sinks

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row}

/** How a target database expresses "insert or update by key": a list
  * of (sql, parameter column names) executed in order for every row.
  */
trait UpsertDialect extends Serializable {
  def upsertStatements(
      table: String, cols: Seq[String], keyCols: Seq[String])
      : Seq[(String, Seq[String])]
  def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String =
    upsertStatements(table, cols, keyCols).map(_._1).mkString("; ")
}

/** Postgres `INSERT … ON CONFLICT (keys) DO UPDATE SET …` — the same
  * statement family the reference emits (`POS_spark_dag.py:178–191`).
  */
object PostgresUpsertDialect extends UpsertDialect {
  override def upsertStatements(
      table: String, cols: Seq[String], keyCols: Seq[String])
      : Seq[(String, Seq[String])] = {
    val nonKey = cols.filterNot(keyCols.contains)
    val setClause =
      if (nonKey.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " + nonKey.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    Seq((s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keyCols.mkString(", ")}) $setClause", cols))
  }
}

/** Portable ANSI upsert: DELETE by key then INSERT, per batch inside
  * one transaction — full-row replace, identical net semantics for
  * whole-row payloads. Used for databases without ON CONFLICT (e.g.
  * the embedded Derby that stands in for Postgres in tests).
  */
object DeleteInsertUpsertDialect extends UpsertDialect {
  override def upsertStatements(
      table: String, cols: Seq[String], keyCols: Seq[String])
      : Seq[(String, Seq[String])] = Seq(
    (s"DELETE FROM $table WHERE " +
      keyCols.map(k => s"$k = ?").mkString(" AND "), keyCols),
    (s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})", cols))
}

/** Distributed JDBC upsert/delete sink — the one genuinely new
  * physical operator the reference needs (SURVEY §4): the reference
  * `collect()`s every fresh row to the driver and runs psycopg2
  * `execute_values` from one process (`POS_spark_dag.py:170–193`),
  * which caps throughput at one connection and OOMs the driver at
  * scale.
  *
  * Here each partition opens its own connection and streams prepared
  * batches — N-executor parallel, constant driver memory. Statements
  * use `INSERT … ON CONFLICT (keys) DO UPDATE SET …` (the same
  * statement family the reference emits), so the sink is idempotent
  * and safe to re-run on task retry — which is exactly what makes it
  * usable as a `foreachBatch` target with exactly-once table results.
  */
class JdbcUpsertSink(
    url: String,
    table: String,
    keyCols: Seq[String],
    connProps: java.util.Properties = new java.util.Properties,
    batchSize: Int = 1000,
    dialect: UpsertDialect = PostgresUpsertDialect) extends Serializable {

  /** The upsert statement for the given column list (dialect-routed;
    * default is the reference's Postgres `ON CONFLICT` family).
    */
  def upsertSql(cols: Seq[String]): String = {
    require(keyCols.forall(cols.contains), "key columns must be present")
    dialect.upsertSql(table, cols, keyCols)
  }

  /** `DELETE FROM t WHERE (k1,…) IN ((?,…),…)` chunk statement. */
  def deleteSql(chunk: Int): String = {
    val tuple = s"(${keyCols.map(_ => "?").mkString(", ")})"
    s"DELETE FROM $table WHERE (${keyCols.mkString(", ")}) IN " +
      (1 to chunk).map(_ => tuple).mkString("(", ", ", ")")
  }

  protected def connect(): Connection = DriverManager.getConnection(url, connProps)

  /** Upsert every row of `df`, partition-parallel. Rows must be unique
    * on `keyCols` (upsert sets are by construction — see
    * [[graft.ops.PosOps.upsert]] / [[graft.streaming.Ingest]]).
    */
  def upsert(df: DataFrame): Unit = {
    val cols = df.columns.toSeq
    require(keyCols.forall(cols.contains), "key columns must be present")
    val stmts = dialect.upsertStatements(table, cols, keyCols)
    val bs = batchSize
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = connect()
        try {
          conn.setAutoCommit(false)
          val prepared = stmts.map { case (sql, params) =>
            (conn.prepareStatement(sql), params.map(cols.indexOf))
          }
          try {
            rows.grouped(bs).foreach { chunk =>
              chunk.foreach { r =>
                prepared.foreach { case (ps, idxs) =>
                  var pi = 0
                  while (pi < idxs.length) {
                    ps.setObject(pi + 1, r.get(idxs(pi))); pi += 1
                  }
                  ps.addBatch()
                }
              }
              // statements run in dialect order per chunk (e.g. all
              // deletes land before the inserts that replace them)
              prepared.foreach(_._1.executeBatch())
            }
            conn.commit()
          } finally prepared.foreach(_._1.close())
        } finally conn.close()
      }
    }
  }

  /** Delete by key-set, partition-parallel (replaces the reference's
    * driver-side `DELETE WHERE IN` after a collect, M1).
    */
  def delete(keys: DataFrame): Unit = {
    require(keys.columns.toSeq == keyCols,
      s"delete frame must be exactly the key columns $keyCols")
    val bs = batchSize
    val kc = keyCols
    val sqlFor = (n: Int) => deleteSql(n)
    keys.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = connect()
        try {
          conn.setAutoCommit(false)
          rows.grouped(bs).foreach { group =>
            val ps = conn.prepareStatement(sqlFor(group.size))
            var idx = 1
            group.foreach { r =>
              kc.indices.foreach { i => ps.setObject(idx, r.get(i)); idx += 1 }
            }
            ps.executeUpdate()
          }
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** Full sync (M3): warehouse becomes exactly `fresh` — delete the
    * stale keys, upsert everything present.
    */
  def sync(snapshot: DataFrame, fresh: DataFrame): Unit = {
    val stale = graft.ops.PosOps.deleteSet(snapshot, fresh, keyCols.head)
      .select(keyCols.head, keyCols.tail: _*)
    delete(stale)
    upsert(fresh)
  }
}

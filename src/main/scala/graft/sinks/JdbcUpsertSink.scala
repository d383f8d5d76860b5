package graft.sinks

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row}

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
    batchSize: Int = 1000) extends Serializable {

  /** `INSERT INTO t (c1,…) VALUES (?,…) ON CONFLICT (k1,…) DO UPDATE
    * SET c=EXCLUDED.c,…` for the given column list.
    */
  def upsertSql(cols: Seq[String]): String = {
    require(keyCols.forall(cols.contains), "key columns must be present")
    val nonKey = cols.filterNot(keyCols.contains)
    val setClause =
      if (nonKey.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " + nonKey.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keyCols.mkString(", ")}) $setClause"
  }

  /** `DELETE FROM t WHERE (k1,…) IN ((?,…),…)` chunk statement. */
  def deleteSql(chunk: Int): String = {
    val tuple = s"(${keyCols.map(_ => "?").mkString(", ")})"
    s"DELETE FROM $table WHERE (${keyCols.mkString(", ")}) IN " +
      (1 to chunk).map(_ => tuple).mkString("(", ", ", ")")
  }

  protected def connect(): Connection = DriverManager.getConnection(url, connProps)

  /** Upsert every row of `df`, partition-parallel. */
  def upsert(df: DataFrame): Unit = {
    val cols = df.columns.toSeq
    val sql = upsertSql(cols)
    val bs = batchSize
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn = connect()
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { r =>
            cols.indices.foreach(i => ps.setObject(i + 1, r.get(i)))
            ps.addBatch()
            n += 1
            if (n % bs == 0) ps.executeBatch()
          }
          ps.executeBatch()
          conn.commit()
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

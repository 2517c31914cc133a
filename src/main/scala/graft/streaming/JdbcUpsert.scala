package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row

/** JDBC upsert seam for the A9 keyed sink (SURVEY.md §2 A9: the
  * reference's habitat upserts features into PostGIS [UPSTREAM-UNVERIFIED
  * — reference checkout empty, SURVEY.md §0]).
  *
  * Same seam pattern as [[Transport]]: this image ships no JDBC driver
  * jar, so the connection is abstracted behind [[SqlConnector]] — a
  * production deployment binds a real `java.sql.Connection`-backed
  * implementation; tests bind a recording stub and exercise the FULL
  * distributed write path (statement generation, batching, per-partition
  * connector lifecycle) minus the socket.
  *
  * Scale shape: `foreachPartition` — one connector per partition, rows
  * streamed in `batchSize` groups, so executor memory holds one group of
  * bind values at a time and the driver holds nothing. Parallelism = the
  * frame's partitioning (repartition upstream to match the database's
  * write concurrency). Statements are parameterized (`?` binds), never
  * value-interpolated.
  */
object JdbcUpsert {

  /** One live database connection. Implementations must be serializable
    * FACTORY products — Spark serializes the closure, so the connector is
    * created inside `foreachPartition`, never shipped from the driver.
    */
  trait SqlConnector extends AutoCloseable {
    /** Execute one parameterized statement with one set of binds. */
    def execute(sql: String, binds: Seq[Any]): Unit

    /** Execute one statement against many bind sets — the JDBC
      * `addBatch`/`executeBatch` round-trip saver. Default: sequential
      * singles (correct for any connector); a real driver-backed
      * implementation overrides it with true statement batching.
      */
    def executeBatch(sql: String, many: Seq[Seq[Any]]): Unit =
      many.foreach(execute(sql, _))
  }

  /** ANSI/PostgreSQL-15 `MERGE` upsert for one row: key columns match,
    * non-key columns update, absent keys insert. Identifiers are
    * double-quote-escaped; values always bind as `?` in `columns` order
    * (used twice: once for the USING row, nothing else — MERGE
    * references the source alias afterward).
    */
  def mergeSql(table: String, columns: Seq[String], keyCols: Seq[String]): String = {
    require(keyCols.nonEmpty && keyCols.forall(columns.contains),
      s"keyCols $keyCols must be a subset of columns $columns")
    val dataCols = columns.filterNot(keyCols.contains)
    require(dataCols.nonEmpty, "merge needs at least one non-key column")
    val srcCols = columns.map(quote).mkString(", ")
    val on = keyCols.map(k => s"t.${quote(k)} = s.${quote(k)}").mkString(" AND ")
    val sets = dataCols.map(c => s"${quote(c)} = s.${quote(c)}").mkString(", ")
    val insertVals = columns.map(c => s"s.${quote(c)}").mkString(", ")
    s"""MERGE INTO ${quote(table)} AS t
       |USING (VALUES (${columns.map(_ => "?").mkString(", ")})) AS s($srcCols)
       |ON $on
       |WHEN MATCHED THEN UPDATE SET $sets
       |WHEN NOT MATCHED THEN INSERT ($srcCols) VALUES ($insertVals)""".stripMargin
  }

  /** PostgreSQL `INSERT … ON CONFLICT DO UPDATE` upsert — the form the
    * PostGIS habitat actually runs (predates MERGE, requires a unique
    * index on the key columns).
    */
  def onConflictSql(table: String, columns: Seq[String], keyCols: Seq[String]): String = {
    require(keyCols.nonEmpty && keyCols.forall(columns.contains),
      s"keyCols $keyCols must be a subset of columns $columns")
    val dataCols = columns.filterNot(keyCols.contains)
    require(dataCols.nonEmpty, "upsert needs at least one non-key column")
    val cols = columns.map(quote).mkString(", ")
    val conflict = keyCols.map(quote).mkString(", ")
    val sets = dataCols.map(c => s"${quote(c)} = EXCLUDED.${quote(c)}").mkString(", ")
    s"""INSERT INTO ${quote(table)} ($cols)
       |VALUES (${columns.map(_ => "?").mkString(", ")})
       |ON CONFLICT ($conflict) DO UPDATE SET $sets""".stripMargin
  }

  private def quote(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  /** Upsert a batch frame through per-partition connectors. The caller
    * dedups to one row per key first (the A9 keep-latest discipline —
    * [[FeaturePipeline.upsertBatch]]'s window does this for the store
    * path); rows within a partition execute in partition order.
    *
    * @param connectorFactory serializable factory invoked once per
    *                         partition ON THE EXECUTOR
    * @param useMerge         true → [[mergeSql]]; false → [[onConflictSql]]
    * @param batchSize        bind sets per [[SqlConnector.executeBatch]]
    *                         call — bounds executor memory to one group
    */
  def upsertBatch(batch: DataFrame, table: String, keyCols: Seq[String],
      connectorFactory: () => SqlConnector, useMerge: Boolean = true,
      batchSize: Int = 500): Unit = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val columns = batch.schema.fieldNames.toSeq
    val sql =
      if (useMerge) mergeSql(table, columns, keyCols)
      else onConflictSql(table, columns, keyCols)
    val n = columns.length
    batch.foreachPartition { rows: Iterator[Row] =>
      val conn = connectorFactory()
      try rows.grouped(batchSize).foreach { group =>
        conn.executeBatch(sql, group.map(r => (0 until n).map(r.get)))
      } finally conn.close()
    }
  }
}

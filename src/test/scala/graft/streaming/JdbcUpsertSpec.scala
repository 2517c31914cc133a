package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The seam is testable without a driver jar: a recording connector
  * captures every (sql, binds) the distributed path emits (local-mode
  * executors share the JVM, so a static queue sees all partitions).
  */
object RecordingConnector {
  val log = new ConcurrentLinkedQueue[(String, Seq[Any])]()
  val closed = new java.util.concurrent.atomic.AtomicInteger(0)
  val batches = new ConcurrentLinkedQueue[Int]()
}

class JdbcUpsertSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  test("mergeSql: snapshot — keys match, non-keys update, identifiers quoted") {
    val sql = JdbcUpsert.mergeSql("features",
      Seq("layer", "feature_id", "geom_wkb", "event_ts"), Seq("layer", "feature_id"))
    assert(sql ==
      """MERGE INTO "features" AS t
        |USING (VALUES (?, ?, ?, ?)) AS s("layer", "feature_id", "geom_wkb", "event_ts")
        |ON t."layer" = s."layer" AND t."feature_id" = s."feature_id"
        |WHEN MATCHED THEN UPDATE SET "geom_wkb" = s."geom_wkb", "event_ts" = s."event_ts"
        |WHEN NOT MATCHED THEN INSERT ("layer", "feature_id", "geom_wkb", "event_ts") VALUES (s."layer", s."feature_id", s."geom_wkb", s."event_ts")""".stripMargin,
      sql)
  }

  test("onConflictSql: snapshot + embedded-quote escaping") {
    val sql = JdbcUpsert.onConflictSql("t\"bl", Seq("k", "v"), Seq("k"))
    assert(sql ==
      """INSERT INTO "t""bl" ("k", "v")
        |VALUES (?, ?)
        |ON CONFLICT ("k") DO UPDATE SET "v" = EXCLUDED."v"""".stripMargin,
      sql)
    intercept[IllegalArgumentException] {
      JdbcUpsert.onConflictSql("t", Seq("k"), Seq("k")) // no non-key column
    }
    intercept[IllegalArgumentException] {
      JdbcUpsert.mergeSql("t", Seq("k", "v"), Seq("missing"))
    }
  }

  test("upsertBatch: every row reaches a connector with schema-order binds; connectors closed") {
    import spark.implicits._
    RecordingConnector.log.clear()
    RecordingConnector.closed.set(0)
    val df = Seq(("poi", "f1", 10L), ("poi", "f2", 20L), ("rd", "f3", 30L))
      .toDF("layer", "feature_id", "version").repartition(3)
    JdbcUpsert.upsertBatch(df, "features", Seq("layer", "feature_id"),
      () => new JdbcUpsert.SqlConnector {
        override def execute(sql: String, binds: Seq[Any]): Unit =
          RecordingConnector.log.add((sql, binds))
        override def close(): Unit = { RecordingConnector.closed.incrementAndGet(); () }
      })
    val got = scala.jdk.CollectionConverters.CollectionHasAsScala(
      RecordingConnector.log).asScala.toSeq
    assert(got.length == 3)
    assert(got.forall(_._1.startsWith("MERGE INTO \"features\"")))
    assert(got.map(_._2).toSet ==
      Set(Seq("poi", "f1", 10L), Seq("poi", "f2", 20L), Seq("rd", "f3", 30L)))
    assert(RecordingConnector.closed.get() == 3, "one close per partition")
  }

  test("upsertBatch: rows group into batchSize executeBatch calls") {
    import spark.implicits._
    RecordingConnector.log.clear()
    RecordingConnector.batches.clear()
    val df = (1 to 5).map(i => (s"k$i", i.toLong)).toDF("k", "v").coalesce(1)
    JdbcUpsert.upsertBatch(df, "t", Seq("k"),
      () => new JdbcUpsert.SqlConnector {
        override def execute(sql: String, binds: Seq[Any]): Unit =
          RecordingConnector.log.add((sql, binds))
        override def executeBatch(sql: String, many: Seq[Seq[Any]]): Unit = {
          RecordingConnector.batches.add(many.length)
          super.executeBatch(sql, many)
        }
        override def close(): Unit = ()
      }, batchSize = 2)
    val sizes = scala.jdk.CollectionConverters.CollectionHasAsScala(
      RecordingConnector.batches).asScala.toSeq
    assert(sizes.sorted == Seq(1, 2, 2), s"batch sizes: $sizes")
    assert(RecordingConnector.log.size == 5, "default executeBatch delegates to execute")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator/query in the engine's public surface.
  *
  * @param name   key in `SparkEntry.queries` (and `oracleSql` when present)
  * @param doc    one-line semantics + scale note (what survives 100 TB)
  * @param oracle equivalent ANSI SQL for the DuckDB oracle; None for
  *               operators not expressible in DuckDB (driver then records a
  *               weaker rows-only check — cover those with ScalaTest instead)
  * @param fn     (session, sfDir) => result DataFrame. Every oracle-checked
  *               query MUST end in a total ORDER BY over a unique key set and
  *               cast float aggregates to DECIMAL first (SURVEY.md §7.4).
  */
final case class QuerySpec(
    name: String,
    doc: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame
)

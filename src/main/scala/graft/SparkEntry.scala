package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: TPC-H Q1-shaped pricing summary (SURVEY.md §7.2) on sf0.001;
    * exercises scan→filter→hash-agg→sort and returns 6 group rows (>0).
    */
  def entry(spark: SparkSession): DataFrame =
    operators.TierB.b11.fn(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * All reads are plain parquet scans: Catalyst pushes predicates/projections
  * into the vectorized parquet reader, so callers should filter/select as
  * early as possible and let the optimizer do the pruning. At 100 TB these
  * would be partitioned/bucketed tables behind a catalog; the loader is the
  * single seam where that swap happens.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * outright (PARQUET_TYPE_ILLEGAL). Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true`; the raw nanos LONG is
    * normalized here to a µs TimestampType so every downstream query sees
    * a plain timestamp column (values are µs-aligned; integer DIV is the
    * same floor-truncation Spark applies natively for ns→µs).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(CAST(ts div 1000 AS BIGINT))"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

package graft.functions

import org.apache.spark.sql.{Encoders, SparkSession, functions => F}

/** SQL surface for the custom sketch aggregates — the [[GeoSql.register]]
  * pattern applied to the sketch family, so `spark.sql` users get the
  * same deterministic sketches the Column API exposes:
  *
  *   graft_hll(key BIGINT)              → STRUCT<est: BIGINT, vEmpty: BIGINT>
  *   graft_bottomk_quantile(rank, v)    → STRUCT<n, p50, p90>
  *   graft_cms(key BIGINT)              → STRUCT<depth, width, counters>
  *
  * All three merge associatively/commutatively (partial aggregation
  * applies from SQL exactly as from the Column API — same Aggregator
  * instances underneath).
  */
object SketchSql {
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_hll", F.udaf(new Hll.HllAggregator))
    spark.udf.register("graft_bottomk_quantile",
      F.udaf(new BottomK.BottomKQuantile(128),
        Encoders.tuple(Encoders.STRING, Encoders.scalaDouble)))
    spark.udf.register("graft_cms", F.udaf(new CountMin.CmsAggregator(4, 1024)))
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional args = query-name filter (local profiling; the driver
    // passes none and gets the full suite).
    val only = args.toSet
    // Untimed warmup: JIT/codegen/parquet-reader init otherwise lands on
    // whichever query runs first (measured 10-20s attributed to the
    // alphabetically-first heavy query). One small representative query
    // per engine path (scan, shuffle agg, UDF) warms the common machinery;
    // per-query numbers then reflect steady-state cost.
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      SparkEntry.queries.get("b11_agg_groupby").foreach(_(spark, sfDir).count())
      SparkEntry.queries.get("c4_fingerprint").foreach(_(spark, sfDir).count())
      // JIT the two remaining cold paths without touching the big tables:
      // string tokenize/sliding (gram family) and the WKB codec UDFs —
      // measured 2-5s of first-use cost otherwise attributed to whichever
      // gram/spatial query runs first alphabetically
      locally {
        import spark.implicits._
        import org.apache.spark.sql.functions._
        val toks = udf { (t: String) =>
          t.split(" ").filter(_.nonEmpty).sliding(2).map(_.mkString(" ")).toArray.distinct }
        (1 to 256).map(i => s"w$i x$i y$i z$i").toDF("t")
          .select(explode(toks($"t"))).count()
        val geo = udf { (x: Double, y: Double) =>
          val d = graft.functions.Wkb.polygon(Seq(Seq((x, y), (x + 1, y), (x + 1, y + 1), (x, y))))
          graft.functions.Wkb.containsPoint(d, x + 0.5, y + 0.25) && graft.functions.Wkb.intersects(d, d) }
        spark.range(256).select(geo($"id".cast("double"), $"id".cast("double"))).count()
      }
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: ${e.getMessage}") }
    // Failed queries report -1.0 (never a silently-timed crash) so the
    // driver can distinguish "fast" from "broken"; errors go to stderr.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val secs = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) secs else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val nFailed = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
  }
}

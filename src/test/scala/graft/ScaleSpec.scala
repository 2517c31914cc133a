package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C7 scale-posture mechanics that sf-sized correctness queries can't
  * show: bucketed co-located joins (no shuffle), partition pruning at the
  * scan, and deterministic skew salting. These are the levers the same
  * code pulls on a 1000-executor cluster; the tests pin that the plans
  * actually engage them.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session
  private val sf = SparkFixture.sfDir

  test("bucketed tables co-locate the equi-join: no shuffle exchange in the plan") {
    import spark.implicits._
    val wh = Files.createTempDirectory("bucketed").toString
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    sources.Tables.orders(spark, sf)
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    sources.Tables.customer(spark, sf)
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").saveAsTable("customer_b")
    val orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path so the bucket co-location is what
      // removes the exchanges (broadcast would hide it)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), "bucketed join still shuffles:\n" + plan)
      assert(joined.count() ==
        sources.Tables.orders(spark, sf)
          .join(sources.Tables.customer(spark, sf), $"o_custkey" === $"c_custkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("partition pruning: year-partitioned layout scans only the matching partition") {
    import spark.implicits._
    val dir = Files.createTempDirectory("partitioned").toString + "/lineitem_by_year"
    sources.Tables.lineitem(spark, sf)
      .withColumn("yr", year($"l_shipdate"))
      .write.partitionBy("yr").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"yr" === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(yr"), plan)
    assert(plan.contains("(yr"), "year filter did not reach partition pruning:\n" + plan)
    val expected = sources.Tables.lineitem(spark, sf)
      .filter(year($"l_shipdate") === 1995).count()
    assert(pruned.count() == expected)
  }

  test("hilbert-keyed layout: a key-range read decodes a fraction of the table (row-group skip)") {
    import spark.implicits._
    // The a11ab claim made operational: range-partition + sort the table by
    // the Hilbert key, and a key-range predicate (what a bbox decomposes
    // into) is answered from the few files/row-groups whose min/max
    // straddle the range — everything else is skipped by parquet stats.
    val dir = Files.createTempDirectory("hilbert-layout").toString + "/events_hkey"
    val keyed = sources.Tables.events(spark, sf)
      .select($"event_id",
        operators.Spatial.hilbertCol(
          (floor($"value").cast("long") % 65536L),
          ($"user_id" % 65536L)).as("hkey"))
    keyed.repartitionByRange(8, $"hkey")
      .sortWithinPartitions($"hkey")
      .write.parquet(dir)
    val total = keyed.count()
    // rank-based cut (≈ the first range-partition's upper bound): the
    // events occupy a small corner of the grid, so the curve's keys are
    // wildly non-uniform over [min, max] — an arithmetic midpoint can
    // land rows in EVERY file; a 1/8 rank cut matches ~1 file by
    // construction of repartitionByRange
    val cut = keyed.stat.approxQuantile("hkey", Array(0.125), 0.0)(0).toLong
    val scan = spark.read.parquet(dir).filter($"hkey" <= cut)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(hkey), LessThanOrEqual(hkey"), plan)
    scan.collect() // populate metrics
    val scanned = scan.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
    // a random layout decodes all `total` rows for this filter; the sorted
    // layout must decode at most the matching files' worth (≲ 2 of 8)
    assert(scanned < total / 2,
      s"sorted-by-hkey layout decoded $scanned of $total rows — stats not skipping")
  }

  test("AQE skew-split engages on a planted 50%-hot key (skew=true in the final plan)") {
    import spark.implicits._
    // the r15 Zipf-skew soak measured AQE absorbing the hot key on plain
    // equi-joins (b4 1.85× worst at sf5); this pins the MECHANISM so a
    // conf regression can't silently disable it: half of 400k probe rows
    // land on key 0, thresholds scaled to the test's shuffle sizes
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(spark.conf.get(k)).toOption).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val left = spark.range(400000)
        .select(when($"id" % 2 === 0, 0L).otherwise($"id").as("k"), $"id".as("v"))
      val right = spark.range(2000).select($"id".as("rk"), ($"id" * 7).as("w"))
      val joined = left.join(right, $"k" === $"rk")
      // collect() executes THIS Dataset's QueryExecution, finalizing its
      // adaptive plan (count() would build and finalize a different one)
      val n = joined.collect().length
      // key 0 matches 200 000 probe rows; odd keys 1..1999 match one each
      assert(n == 200000 + 1000, s"unexpected join cardinality $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), "not a final adaptive plan:\n" + plan)
      assert(plan.contains("skew=true"),
        "AQE did not mark the hot partition skewed:\n" + plan)
    } finally saved.foreach {
      // conf.get can return null (unset optional conf) rather than throw
      case (k, Some(v)) if v != null => spark.conf.set(k, v)
      case (k, _) => spark.conf.unset(k)
    }
  }

  test("AQE on, broadcast off, sf0.1: blocked pair joins stay equi-joins (never BNLJ/cartesian)") {
    // The PlanAuditSpec runs at a scale where every build side broadcasts;
    // this audit removes that safety net — broadcast disabled entirely,
    // AQE re-planning live, the big sf — and pins that the kNN label-block
    // and LSH band-bucket self-joins still resolve their equi keys into a
    // shuffled join. The failure mode it guards: a lineage-aliasing
    // refactor turning the join condition trivially true, which AQE would
    // then execute as a BNLJ/cartesian over the whole corpus.
    val origBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "AQE should be on by default in this audit")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the newest shuffle-heavy shapes are audited alongside the original
      // two: the gram-decontamination join must also survive broadcast-off
      // without degrading
      for (name <- Seq("c3_knn_cosine", "c2_dedup_pairs",
          "c4_decontam", "b8b_interval_join")) {
        val df = Registry.queries(name)(spark, "/root/testdata/sf0.1")
        df.collect() // drive to completion so AQE's FINAL plan is inspected
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("isFinalPlan=true"), s"$name: not a final adaptive plan")
        assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
          s"$name degraded to a non-equi join at sf0.1:\n" + plan)
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"$name: expected a shuffled equi-join on the block key:\n" + plan)
      }
      // the grid-blocked spatial joins pin their 25-row nation-diamond
      // side broadcast EXPLICITLY (r18 — the hint ignores the threshold by
      // design; nation cardinality is value-bounded forever), so under
      // broadcast-off they stay BroadcastHashJoin. The audit's actual
      // guard — equi keys never degrading to BNLJ/cartesian — still holds
      // verbatim: with the hint in place, a lineage-aliasing refactor that
      // lost the cell equi-keys would surface as BroadcastNestedLoopJoin.
      for (name <- Seq("a11d_spatial_join", "a11f_polygon_join")) {
        val df = Registry.queries(name)(spark, "/root/testdata/sf0.1")
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("isFinalPlan=true"), s"$name: not a final adaptive plan")
        assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
          s"$name degraded to a non-equi join at sf0.1:\n" + plan)
        assert(plan.contains("BroadcastHashJoin"),
          s"$name: expected the pinned broadcast equi-join on the cell key:\n" + plan)
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", origBroadcast)
  }

  test("C3 adaptive fanout: LSH planes and IVF cells grow with the corpus") {
    import spark.implicits._
    // the formulas are pure in N: monotone, clamped, and target-holding
    assert(operators.TierCSim.lshPlanes(100) < operators.TierCSim.lshPlanes(100000))
    assert(operators.TierCSim.lshPlanes(100000) < operators.TierCSim.lshPlanes(100000000))
    assert(operators.TierCSim.lshPlanes(Long.MaxValue) == 24, "plane clamp")
    assert(operators.TierCSim.ivfCells(100) < operators.TierCSim.ivfCells(100000))
    assert(operators.TierCSim.ivfCells(100000000) == 256, "cell clamp")
    assert(operators.TierCSim.ivfCells(1) == 1 && operators.TierCSim.lshPlanes(1) == 1)
    // end-to-end: the realized bucket space is strictly larger on the
    // bigger corpus (deterministic synthetic embeddings, no RNG)
    def corpus(n: Int) = (0 until n).map { i =>
      (i.toLong, Array.tabulate(8) { d =>
        (((i * 31 + d * 17) % 13) - 6).toFloat / 6.0f })
    }.toDF("vec_id", "embedding")
    def distinctBuckets(n: Int): Long = {
      val planes = operators.TierCSim.lshPlanes(n)
      corpus(n).select(operators.TierCSim.bucketUdf(planes)($"embedding").as("b"))
        .distinct().count()
    }
    val small = distinctBuckets(128)
    val big = distinctBuckets(8192)
    assert(big > small, s"bucket count did not grow with corpus size ($small -> $big)")
  }

  test("saltedJoin equals the plain join and scatters the hot key across salts") {
    import spark.implicits._
    // hot key: one customer with 10k orders, plus a long tail
    val large = (1 to 10000).map(i => (1L, i.toLong)) ++ (1 to 100).map(i => (i.toLong + 1, 0L))
    val largeDf = large.toDF("cust", "order_id")
    val smallDf = (1 to 200).map(i => (i.toLong, s"name$i")).toDF("cust_s", "name")
    val plain = largeDf.join(smallDf, $"cust" === $"cust_s")
      .select($"cust", $"order_id", $"name")
      .collect().map(_.toString).sorted.toSeq
    val salted = operators.Skew.saltedJoin(largeDf, smallDf, "cust", "cust_s", 8, "order_id")
      .select($"cust", $"order_id", $"name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain, "salted join changed the result")
    val saltSpread = largeDf.filter($"cust" === 1L)
      .withColumn("_graft_salt", pmod(hash($"order_id"), lit(8)))
      .select("_graft_salt").distinct().count()
    assert(saltSpread == 8, s"hot key only spread over $saltSpread salts")
  }
}

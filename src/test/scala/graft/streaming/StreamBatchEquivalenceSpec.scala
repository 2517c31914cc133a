package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.sources.Tables

/** Streaming ↔ batch output equivalence (VERDICT r13 directive #2): every
  * batch query has had a DuckDB hash gate since r1, but the streaming
  * pipelines were only spec-pinned on hand-picked micro-fixtures. This
  * suite gives the streaming half the same hard signal: each pipeline
  * with a batch analog runs TO COMPLETION over a fixed file-stream
  * fixture (real sf0.001 events), and its Append-mode sink must equal
  * the SAME transformation executed as one batch plan over the same
  * files — row for row, no tolerance.
  *
  * Mechanics: the pipeline functions are mode-agnostic DataFrame
  * transforms (withWatermark is eliminated on batch plans), so the two
  * arms share ONE definition site and cannot drift. The stream arm reads
  * the fixture dir with maxFilesPerTrigger=1 under Trigger.AvailableNow;
  * two far-future sentinel files (mtime-ordered after the data) drive
  * the watermark past every real window — sentinel #1's batch runs with
  * the watermark advanced by the real data, and sentinel #2's batch runs
  * with it advanced past sentinel #1, so every real window has provably
  * closed by termination. Sentinel keys are excluded from the compare
  * (their own windows never finish closing — that asymmetry is Append
  * semantics, not drift).
  */
class StreamBatchEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Far-future sentinel timestamps: +40 and +41 days past the sf0.001
    * events span — any real window/session/gap is closed long before.
    */
  private val SentinelUs = Seq(70L * 86400L * 1000000L + 1704067200000000L,
    71L * 86400L * 1000000L + 1704067200000000L)

  /** Land `real` as one parquet file and each sentinel frame as its own
    * file, with strictly increasing mtimes so the file source (default
    * latestFirst=false, mtime order) processes data first, then the
    * sentinels in order.
    */
  private def landFixture(real: DataFrame, sentinels: Seq[DataFrame]): String = {
    val dir = tmpDir("sbe_src")
    def land(df: DataFrame, name: String, mtime: Long): Unit = {
      val stage = tmpDir("sbe_stage")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new File(stage).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new File(dir, name)
      Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 600000L
    land(real, "data.parquet", t0)
    sentinels.zipWithIndex.foreach { case (s, i) =>
      land(s, s"sentinel$i.parquet", t0 + (i + 1) * 30000L)
    }
    dir
  }

  /** Run `pipe` over the fixture as a file stream to completion, and as
    * one batch plan over the data file alone; return (streamRows,
    * batchRows) with `exclude` filtered from the stream sink.
    */
  private def bothArms(real: DataFrame, sentinels: Seq[DataFrame],
      pipe: DataFrame => DataFrame, sinkName: String,
      exclude: DataFrame => DataFrame = identity): (Seq[Row], Seq[Row]) = {
    val src = landFixture(real, sentinels)
    val schema: StructType = real.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = pipe(stream).writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(sinkName)
      .option("checkpointLocation", tmpDir("sbe_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000L) finally q.stop()
    val streamRows = exclude(spark.table(sinkName)).collect().toSeq
    val batchRows = pipe(spark.read.schema(schema)
      .parquet(src + "/data.parquet")).collect().toSeq
    (streamRows, batchRows)
  }

  private def assertSame(stream: Seq[Row], batch: Seq[Row], what: String): Unit = {
    val s = stream.map(_.toString).sorted
    val b = batch.map(_.toString).sorted
    assert(b.nonEmpty, s"$what: batch arm produced no rows — fixture broken")
    assert(s == b,
      s"$what: stream sink != batch plan (${s.length} vs ${b.length} rows);" +
        s" only-stream=${s.diff(b).take(3)} only-batch=${b.diff(s).take(3)}")
  }

  import spark.implicits._

  private lazy val events = Tables.events(spark, SparkFixture.sfDir)
    .select($"user_id", $"ts".as("event_ts"), $"value", $"event_id", $"event_type")
    .cache()

  test("sessionizeStream == batch session_window over the same files (b30/b98 analog)") {
    val real = events.select($"user_id", $"event_ts")
    val sent = SentinelUs.map(us =>
      Seq((999999L, us)).toDF("user_id", "ts_us")
        .select($"user_id", timestamp_micros($"ts_us").as("event_ts")))
    val (s, b) = bothArms(real, sent,
      df => FeaturePipeline.sessionizeStream(df, gap = "30 minutes", watermark = "1 minute"),
      "sbe_session", df => df.filter($"user_id" =!= 999999L))
    assertSame(s, b, "sessionize")
  }

  test("zonalStatsStream == batch zonal windows over the same files (a11ao analog)") {
    val pointUdf = udf { (x: Double, y: Double) => graft.functions.Wkb.point(x, y) }
    val fences = Seq(
      ("z0", graft.functions.Wkb.polygon(Seq(Seq(
        (0.0, 0.0), (40.0, 0.0), (40.0, 40.0), (0.0, 40.0), (0.0, 0.0))))),
      ("z1", graft.functions.Wkb.polygon(Seq(Seq(
        (30.0, 0.0), (70.0, 0.0), (70.0, 40.0), (30.0, 40.0), (30.0, 0.0))))))
      .toDF("fence_id", "fence_wkb")
    val real = events.select(
      pointUdf($"value" % 80.0, ($"user_id" % 80L).cast("double")).as("geom_wkb"),
      $"value", $"event_ts")
    // sentinel points sit far outside every fence: they advance the
    // watermark but contribute no sink rows at all
    val sent = SentinelUs.map(us =>
      Seq((9999.0, 9999.0, 0.0, us)).toDF("x", "y", "value", "ts_us")
        .select(pointUdf($"x", $"y").as("geom_wkb"), $"value",
          timestamp_micros($"ts_us").as("event_ts")))
    val (s, b) = bothArms(real, sent,
      df => FeaturePipeline.zonalStatsStream(df, fences,
        windowDur = "6 hours", watermark = "1 minute"),
      "sbe_zonal")
    assertSame(s, b, "zonal")
  }

  test("waveformStream == batch waveform windows over the same files (c6q analog)") {
    import graft.operators.Multimodal.WavCodec
    val wavUdf = udf { (id: Long) =>
      WavCodec.build(16000, 1, 16, s"pcm payload $id for waveform".getBytes("UTF-8")) }
    val real = events.select($"event_type".as("layer"), $"event_ts",
      wavUdf($"event_id").as("payload"))
    val sent = SentinelUs.map(us =>
      Seq(("__sentinel", us, 0L)).toDF("layer", "ts_us", "id")
        .select($"layer", timestamp_micros($"ts_us").as("event_ts"),
          wavUdf($"id").as("payload")))
    val (s, b) = bothArms(real, sent,
      df => FeaturePipeline.waveformStream(df, windowDur = "6 hours", watermark = "1 minute"),
      "sbe_wave", df => df.filter($"layer" =!= "__sentinel"))
    assertSame(s, b, "waveform")
  }

  test("streaming tumbling window == batch tumbling window (b28 analog)") {
    val real = events.select($"event_ts", $"value")
    val sent = SentinelUs.map(us =>
      Seq((us, 0.0)).toDF("ts_us", "value")
        .select(timestamp_micros($"ts_us").as("event_ts"), $"value"))
    val maxReal = new java.sql.Timestamp(1706657176221L) // just past sf0.001 max ts
    def tumble(df: DataFrame): DataFrame = df
      .withWatermark("event_ts", "1 minute")
      .groupBy(window($"event_ts", "6 hours"))
      .agg(count(lit(1)).as("n"),
        sum(floor($"value" * 100.0).cast("long")).as("cents"))
      .select($"window.start".as("win_start"), $"n", $"cents")
    val (s, b) = bothArms(real, sent, tumble, "sbe_tumble",
      df => df.filter($"win_start" < maxReal))
    assertSame(s, b, "tumble")
  }

  test("streaming sliding window == batch sliding window (b29 analog)") {
    val real = events.select($"event_ts", $"value")
    val sent = SentinelUs.map(us =>
      Seq((us, 0.0)).toDF("ts_us", "value")
        .select(timestamp_micros($"ts_us").as("event_ts"), $"value"))
    val maxReal = new java.sql.Timestamp(1706657176221L)
    def slide(df: DataFrame): DataFrame = df
      .withWatermark("event_ts", "1 minute")
      .groupBy(window($"event_ts", "12 hours", "6 hours"))
      .agg(count(lit(1)).as("n"),
        sum(floor($"value" * 100.0).cast("long")).as("cents"))
      .select($"window.start".as("win_start"), $"n", $"cents")
    val (s, b) = bothArms(real, sent, slide, "sbe_slide",
      df => df.filter($"win_start" < maxReal))
    assertSame(s, b, "slide")
  }

  /** Two-source arm runner for the stream-stream joins: each source gets
    * its own fixture dir (data file + its sentinels, mtime-ordered), the
    * stream arm joins the two file streams to completion, and the batch
    * arm applies the SAME function to the two data files read as batch
    * frames.
    */
  private def bothArms2(realA: DataFrame, sentA: Seq[DataFrame],
      realB: DataFrame, sentB: Seq[DataFrame],
      pipe: (DataFrame, DataFrame) => DataFrame, sinkName: String,
      exclude: DataFrame => DataFrame): (Seq[Row], Seq[Row]) = {
    val srcA = landFixture(realA, sentA)
    val srcB = landFixture(realB, sentB)
    val sA = spark.readStream.schema(realA.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcA)
    val sB = spark.readStream.schema(realB.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcB)
    val q = pipe(sA, sB).writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(sinkName)
      .option("checkpointLocation", tmpDir("sbe_ckpt2"))
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(180000L) finally q.stop()
    val streamRows = exclude(spark.table(sinkName)).collect().toSeq
    val batchRows = exclude(pipe(
      spark.read.schema(realA.schema).parquet(srcA + "/data.parquet"),
      spark.read.schema(realB.schema).parquet(srcB + "/data.parquet"))).collect().toSeq
    (streamRows, batchRows)
  }

  private def enrichInputs = {
    val obs = events.select($"event_id", $"event_type".as("layer"),
      $"event_ts".as("obs_ts"))
    // context exists only for ~1/3 of the traffic: the outer join's
    // null-padded arm then carries real weight in the compare
    val ctx = events.filter($"user_id" % 3 === 0)
      .select($"event_id".as("ctx_id"), $"event_type".as("ctx_layer"),
        $"event_ts".as("ctx_ts"))
    (obs, ctx)
  }
  private def enrichSentinels = {
    val sentObs = SentinelUs.map(us =>
      Seq((-1L, "__s", us)).toDF("event_id", "layer", "ts_us")
        .select($"event_id", $"layer", timestamp_micros($"ts_us").as("obs_ts")))
    val sentCtx = SentinelUs.map(us =>
      Seq((-1L, "__t", us)).toDF("ctx_id", "ctx_layer", "ts_us")
        .select($"ctx_id", $"ctx_layer", timestamp_micros($"ts_us").as("ctx_ts")))
    (sentObs, sentCtx)
  }

  test("enrichStream (stream-stream interval join) == batch interval join (b8 analog)") {
    val (obs, ctx) = enrichInputs
    val (sentObs, sentCtx) = enrichSentinels
    val (s, b) = bothArms2(obs, sentObs, ctx, sentCtx,
      (o, c) => FeaturePipeline.enrichStream(o, c, lookbackSec = 600, watermark = "1 minute")
        .select($"event_id", $"layer", $"obs_ts", $"ctx_id", $"ctx_ts"),
      "sbe_enrich", df => df.filter($"layer" =!= "__s"))
    assertSame(s, b, "enrich-inner")
  }

  test("enrichStreamOuter (left-outer stream-stream join) == batch left-outer join") {
    val (obs, ctx) = enrichInputs
    val (sentObs, sentCtx) = enrichSentinels
    val (s, b) = bothArms2(obs, sentObs, ctx, sentCtx,
      (o, c) => FeaturePipeline.enrichStreamOuter(o, c, lookbackSec = 600, watermark = "1 minute")
        .select($"event_id", $"layer", $"obs_ts", $"ctx_id", $"ctx_ts"),
      "sbe_enrich_outer", df => df.filter($"layer" =!= "__s"))
    // the outer join's whole point: unmatched observations appear
    // null-padded in BOTH arms identically
    assert(b.exists(_.isNullAt(3)), "fixture must exercise the null-padded arm")
    assertSame(s, b, "enrich-outer")
  }

  test("geofenceTransitions (flatMapGroupsWithState) == batch lag-window set-difference twin") {
    // the zone-set state machine against its pure-window batch analog:
    // per entity in ts order, enter = now − prev, exit = prev − now. The
    // fixture lands as THREE ts-ordered slices so state genuinely crosses
    // batch boundaries; ts_us = event_id keeps (entity, ts) unique (equal
    // timestamps are dropped by the stream's ordering guard and would
    // make the batch twin's lag ambiguous).
    val fences = Seq(
      ("z0", graft.functions.Wkb.polygon(Seq(Seq(
        (0.0, 0.0), (40.0, 0.0), (40.0, 40.0), (0.0, 40.0), (0.0, 0.0))))),
      ("z1", graft.functions.Wkb.polygon(Seq(Seq(
        (30.0, 0.0), (70.0, 0.0), (70.0, 40.0), (30.0, 40.0), (30.0, 0.0))))))
    val base = events.select(
      ($"user_id" % 50L).as("entity_id"), $"event_id".as("ts_us"),
      ($"value" % 90.0).as("x"), (($"user_id" + $"event_id") % 90L).cast("double").as("y"))
    val n = base.count()
    val srcDir = tmpDir("sbe_trans")
    val t0 = System.currentTimeMillis() - 600000L
    (0 until 3).foreach { i =>
      val stage = tmpDir("sbe_trans_stage")
      base.filter($"ts_us" >= i * n / 3 && $"ts_us" < (i + 1) * n / 3)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, s"slice$i.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(t0 + i * 30000L))
    }
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = FeaturePipeline.geofenceTransitions(stream, fences).toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sbe_trans")
      .option("checkpointLocation", tmpDir("sbe_trans_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000L) finally q.stop()
    val streamRows = spark.table("sbe_trans").collect().map(_.toString).sorted.toSeq
    // batch twin: sorted zone array per observation, lag over the entity
    // timeline, exploded set differences
    val zonesUdf = udf { (x: Double, y: Double) =>
      fences.collect { case (id, wkb)
        if graft.functions.Wkb.containsPoint(wkb, x, y) => id }.sorted }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"entity_id").orderBy($"ts_us")
    val tl = spark.read.schema(base.schema).parquet(srcDir)
      .withColumn("zones", zonesUdf($"x", $"y"))
      .withColumn("prev", lag($"zones", 1, Array.empty[String]).over(w))
    val batchRows = (
      tl.select($"entity_id", $"ts_us",
          explode(array_except($"zones", $"prev")).as("fence_id"), lit("enter").as("kind"))
        unionAll
      tl.select($"entity_id", $"ts_us",
          explode(array_except($"prev", $"zones")).as("fence_id"), lit("exit").as("kind"))
      ).collect().map(_.toString).sorted.toSeq
    assert(batchRows.nonEmpty && batchRows.exists(_.contains("exit")),
      "fixture must exercise both edge kinds")
    assert(streamRows == batchRows,
      s"${streamRows.length} vs ${batchRows.length}; only-stream=${streamRows.diff(batchRows).take(3)} only-batch=${batchRows.diff(streamRows).take(3)}")
  }

  test("rateAnomalyStream (flatMapGroupsWithState) == batch sorted-fold EWMA twin (b75/b91 analog)") {
    // the closed-bucket EWMA state machine against a per-key sorted fold:
    // three ts-ordered slices so open buckets genuinely survive batch
    // boundaries before a newer bucket closes them
    val bucketUs = 3600000000L // 1 hour
    val base = events.select(
      concat(lit("u"), $"user_id" % 25L).as("key"),
      unix_micros($"event_ts").as("ts_us"))
    val (lo, hi) = {
      val r = base.agg(min($"ts_us"), max($"ts_us")).head()
      (r.getLong(0), r.getLong(1) + 1)
    }
    val srcDir = tmpDir("sbe_rate")
    val t0 = System.currentTimeMillis() - 600000L
    (0 until 3).foreach { i =>
      val stage = tmpDir("sbe_rate_stage")
      base.filter($"ts_us" >= lo + (hi - lo) * i / 3 &&
          $"ts_us" < lo + (hi - lo) * (i + 1) / 3)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, s"slice$i.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(t0 + i * 30000L))
    }
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = FeaturePipeline.rateAnomalyStream(stream, bucketUs).toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sbe_rate")
      .option("checkpointLocation", tmpDir("sbe_rate_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000L) finally q.stop()
    val streamRows = spark.table("sbe_rate").collect().map(_.toString).sorted.toSeq
    // batch twin: per-key bucket counts in bucket order, all but the LAST
    // (still-open) bucket emitted through the same integer EWMA chain
    val foldUdf = udf { (bs: Seq[org.apache.spark.sql.Row]) =>
      var ewma = 0L; var nClosed = 0L
      bs.dropRight(1).map { r =>
        val (b, c) = (r.getLong(0), r.getLong(1))
        val cntE6 = c * 1000000L
        val alarm = nClosed > 0 && c >= 4 && cntE6 > 2L * ewma
        val dev = cntE6 - ewma
        val out = (b, c, ewma, dev, alarm)
        ewma = if (nClosed == 0) cntE6 else ewma + ((cntE6 - ewma) >> 3)
        nClosed += 1
        out
      }
    }
    val batchRows = spark.read.schema(base.schema).parquet(srcDir)
      // integral div, NOT double floor — µs values (~1.7e15) lose integer
      // precision through a double quotient at bucket boundaries
      .withColumn("bucket", expr(s"(ts_us div ${bucketUs}L) * ${bucketUs}L"))
      .groupBy($"key", $"bucket").agg(count(lit(1)).as("cnt"))
      .groupBy($"key")
      .agg(sort_array(collect_list(struct($"bucket", $"cnt"))).as("bs"))
      .select($"key", explode(foldUdf($"bs")).as("a"))
      .select($"key", $"a._1".as("bucket_us"), $"a._2".as("cnt"),
        $"a._3".as("ewma_e6"), $"a._4".as("dev_e6"), $"a._5".as("alarm"))
      .collect().map(_.toString).sorted.toSeq
    assert(batchRows.nonEmpty, "fixture produced no closed buckets")
    assert(streamRows == batchRows,
      s"${streamRows.length} vs ${batchRows.length}; " +
        s"only-stream=${streamRows.diff(batchRows).take(3)} " +
        s"only-batch=${batchRows.diff(streamRows).take(3)}")
  }

  test("asofStreamEventTime (watermark-buffered) == batch as-of join under " +
      "OUT-OF-ORDER slices (pin #13 — the exactness the register cannot give)") {
    import spark.implicits._
    // tagged feed as in pin #12, plus a per-row JITTERED slicing key:
    // slices cut on ts + jitter(event_id), so rows land up to 15 s out of
    // event-time order across batches — bounded disorder the 16 s
    // watermark delay must absorb with ZERO drops
    val base = events.select(($"user_id" % 25L).as("key"),
      unix_micros($"event_ts").as("ts_us"),
      ($"event_id" % 2L === 0L).as("is_quote"),
      when($"event_id" % 2L === 0L, $"value")
        .otherwise($"event_id".cast("double")).as("v"),
      (unix_micros($"event_ts") + ($"event_id" % 16L) * 1000000L).as("jts"))
    val (lo, hi) = {
      val r = base.agg(min($"jts"), max($"jts")).head()
      (r.getLong(0), r.getLong(1) + 1)
    }
    val srcDir = tmpDir("sbe_asof_et")
    val t0 = System.currentTimeMillis() - 600000L
    def landSlice(df: DataFrame, name: String, mtime: Long): Unit = {
      val stage = tmpDir("sbe_asof_et_stage")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(mtime))
    }
    (0 until 3).foreach { i =>
      landSlice(base.filter($"jts" >= lo + (hi - lo) * i / 3 &&
          $"jts" < lo + (hi - lo) * (i + 1) / 3)
        .select($"key", $"ts_us", $"is_quote", $"v"),
        s"slice$i.parquet", t0 + i * 30000L)
    }
    // sentinel quotes on a reserved key drive the watermark past every
    // real trade (two files: the second's batch runs with the watermark
    // advanced by the first, firing the flush timeouts)
    SentinelUs.zipWithIndex.foreach { case (us, i) =>
      landSlice(Seq((999L, us, true, 0.0)).toDF("key", "ts_us", "is_quote", "v"),
        s"sentinel$i.parquet", t0 + 200000L + i * 30000L)
    }
    val schema = base.select($"key", $"ts_us", $"is_quote", $"v").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = FeaturePipeline.asofStreamEventTime(stream, "16 seconds").toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sbe_asof_et")
      .option("checkpointLocation", tmpDir("sbe_asof_et_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000L) finally q.stop()
    val streamRows = spark.table("sbe_asof_et").filter($"key" =!= 999L)
      .collect().map(_.toString).sorted.toSeq
    // batch twin: the declarative as-of — per trade, the max-(ts, v)
    // quote at-or-before it, left-outer for quoteless keys
    val all = spark.read.schema(schema).parquet(srcDir).filter($"key" =!= 999L)
    val t = all.filter(!$"is_quote")
      .select($"key", $"ts_us".as("trade_ts_us"), $"v".as("trade_v"))
    val qs = all.filter($"is_quote")
      .select($"key".as("kq"), $"ts_us".as("q_ts"), $"v".as("q_v"))
    val batchRows = t.join(qs, $"key" === $"kq" && $"q_ts" <= $"trade_ts_us", "left")
      .groupBy($"key", $"trade_ts_us", $"trade_v")
      .agg(max(when($"q_ts".isNotNull, struct($"q_ts", $"q_v"))).as("best"))
      .select($"key", $"trade_ts_us", $"trade_v",
        $"best.q_ts".as("quote_ts_us"), $"best.q_v".as("quote_v"))
      .collect().map(_.toString).sorted.toSeq
    assert(batchRows.nonEmpty, "fixture produced no trades")
    // the pin: EXACT equality under disorder — every trade emitted, every
    // retro quote matched, nothing dropped
    assert(streamRows == batchRows,
      s"${streamRows.length} vs ${batchRows.length}; " +
        s"only-stream=${streamRows.diff(batchRows).take(3)} " +
        s"only-batch=${batchRows.diff(streamRows).take(3)}")
  }

  test("asofStream (latest-quote register) == batch declarative as-of join (b9 analog)") {
    // tagged feed from events: even ids = quotes (v = value), odd ids =
    // trades with UNIQUE v (= event_id) so the batch twin's groupBy
    // cannot collapse duplicate trades
    val base = events.select(($"user_id" % 25L).as("key"),
      unix_micros($"event_ts").as("ts_us"),
      ($"event_id" % 2L === 0L).as("is_quote"),
      when($"event_id" % 2L === 0L, $"value")
        .otherwise($"event_id".cast("double")).as("v"))
    val (lo, hi) = {
      val r = base.agg(min($"ts_us"), max($"ts_us")).head()
      (r.getLong(0), r.getLong(1) + 1)
    }
    // three ts-RANGE slices (cuts on ts VALUES, so equal-ts rows never
    // straddle a batch boundary — the register's monotone-ingest contract)
    val srcDir = tmpDir("sbe_asof")
    val t0 = System.currentTimeMillis() - 600000L
    (0 until 3).foreach { i =>
      val stage = tmpDir("sbe_asof_stage")
      base.filter($"ts_us" >= lo + (hi - lo) * i / 3 &&
          $"ts_us" < lo + (hi - lo) * (i + 1) / 3)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, s"slice$i.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(t0 + i * 30000L))
    }
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = FeaturePipeline.asofStream(stream).toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sbe_asof")
      .option("checkpointLocation", tmpDir("sbe_asof_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(120000L) finally q.stop()
    val streamRows = spark.table("sbe_asof").collect().map(_.toString).sorted.toSeq
    // batch twin: the DECLARATIVE as-of — per trade, the max-(ts, v)
    // quote at-or-before it, left-outer for quoteless keys
    val all = spark.read.schema(base.schema).parquet(srcDir)
    val t = all.filter(!$"is_quote")
      .select($"key", $"ts_us".as("trade_ts_us"), $"v".as("trade_v"))
    val qs = all.filter($"is_quote")
      .select($"key".as("kq"), $"ts_us".as("q_ts"), $"v".as("q_v"))
    val batchRows = t.join(qs, $"key" === $"kq" && $"q_ts" <= $"trade_ts_us", "left")
      .groupBy($"key", $"trade_ts_us", $"trade_v")
      .agg(max(when($"q_ts".isNotNull, struct($"q_ts", $"q_v"))).as("best"))
      .select($"key", $"trade_ts_us", $"trade_v",
        $"best.q_ts".as("quote_ts_us"), $"best.q_v".as("quote_v"))
      .collect().map(_.toString).sorted.toSeq
    assert(batchRows.nonEmpty)
    assert(streamRows == batchRows,
      s"${streamRows.length} vs ${batchRows.length}; " +
        s"only-stream=${streamRows.diff(batchRows).take(3)} " +
        s"only-batch=${batchRows.diff(streamRows).take(3)}")
  }

  test("ivfPqProbeStream (foreachBatch over the saved index) == batch prebuilt probe (c3_ivfpq_prebuilt analog)") {
    import graft.operators.TierCSim
    val dim = 64
    val vecs = for {
      c <- 0 until 5
      mm <- 0 until 4
    } yield {
      val base = Array.tabulate(dim)(i => math.sin(c * 37 + i).toFloat * 10f)
      base(mm % dim) += 0.01f * (mm + 1)
      (c * 10L + mm, base.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val idx = tmpDir("sbe_ivfpq_idx")
    TierCSim.saveIvfPqIndex(spark, df, idx, cells = 5)
    // queries arrive as a file STREAM in three slices; probes are per-row
    // independent, so no sentinels and no watermark are needed
    val src = tmpDir("sbe_ivfpq_src")
    Seq(0, 1, 2).foreach { i =>
      df.filter($"vec_id" % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$src/slice$i")
    }
    val schema = df.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src + "/slice*")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = TierCSim.ivfPqProbeStream(stream, idx, 3, tmpDir("sbe_ivfpq_ckpt"),
      (res, _) => res.collect().foreach(r => got.add(r.toString)))
    try {
      q.processAllAvailable()
    } finally q.stop()
    val want = TierCSim.ivfPqSearchPrebuilt(spark, df, idx, 3)
      .collect().map(_.toString)
    val gotSeq = scala.jdk.CollectionConverters.CollectionHasAsScala(got).asScala.toSeq
    assert(gotSeq.sorted == want.sorted.toSeq && want.nonEmpty,
      s"stream probe ${gotSeq.length} rows vs batch ${want.length}")
  }

  test("stateless geofenceAlerts: stream rows == batch rows (a11w analog)") {
    val pointUdf = udf { (x: Double, y: Double) => graft.functions.Wkb.point(x, y) }
    val fences = Seq(
      ("z0", graft.functions.Wkb.polygon(Seq(Seq(
        (0.0, 0.0), (40.0, 0.0), (40.0, 40.0), (0.0, 40.0), (0.0, 0.0))))))
      .toDF("fence_id", "fence_wkb")
    val real = events.select($"event_id",
      pointUdf($"value" % 80.0, ($"user_id" % 80L).cast("double")).as("geom_wkb"))
    // stateless: no watermark, no sentinels needed — every input row's
    // verdict emits in its own batch
    val (s, b) = bothArms(real, Seq.empty,
      df => FeaturePipeline.geofenceAlerts(df, fences).select($"event_id", $"fence_id"),
      "sbe_fence")
    assertSame(s, b, "geofence")
  }
}

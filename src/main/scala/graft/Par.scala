package graft

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair for unsplittable inputs (optimization guide
  * §2.5): parquet is split at ROW-GROUP granularity, so a table written as
  * one file with one row group scans as ONE task no matter how many cores
  * the session has — and every expensive per-row projection downstream of
  * that scan (geometry probes, byte decodes, per-row DP) runs serially on
  * one core while the rest idle. All the driver-generated sf tables ship
  * exactly like that (one file, one row group).
  *
  * [[spread]] inserts a round-robin repartition to the session's default
  * parallelism ONLY when the input layout cannot feed the cores by itself:
  * strictly fewer input files than task slots AND a bounded input size
  * (`SPARK_GRAFT_SPREAD_MAX_BYTES`, default 256 MiB — at that size the
  * narrow-row exchange costs tens of milliseconds on local disk/memory,
  * far below the serial compute it unlocks). At production scale either
  * the file count already exceeds the slot count (identity — no exchange
  * is ever added) or the table is above the byte bound (identity — a
  * multi-GB repartition of a base table is a decision to make with
  * measurements, never silently). The helper never changes WHAT is
  * computed, only how many tasks compute it; round-robin repartition is
  * deterministic under retries (sort-before-repartition, SPARK-23207, on
  * by default).
  */
object Par {
  private val SpreadMaxBytes: Long =
    sys.env.get("SPARK_GRAFT_SPREAD_MAX_BYTES").map { s =>
      // a malformed value must name the env var, not surface as an
      // ExceptionInInitializerError far from the cause (ADVICE r17)
      try s.trim.toLong
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"SPARK_GRAFT_SPREAD_MAX_BYTES must be a byte count, got '$s'")
      }
    }.getOrElse(256L << 20)

  def spread(df: DataFrame): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    val files = df.inputFiles.length
    lazy val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (files > 0 && files < slots && bytes <= BigInt(SpreadMaxBytes))
      df.repartition(slots)
    else df
  }

  /** Eager lineage barrier for iterative loops (c2_hits / c2_kcore / b52):
    * every round references its input 2+ times, so without a barrier the
    * plan re-executes the previous round per reference (2^rounds blowup —
    * see the call sites' measurements). Default is `localCheckpoint()` —
    * executor-local blocks, the right local/bench choice — but its blocks
    * die with their executor, and on a real cluster that TRUNCATED lineage
    * cannot be recomputed: one lost executor fails the job (VERDICT r17
    * #4). `SPARK_GRAFT_RELIABLE_PIN=1` switches to a reliable
    * `checkpoint()` into `spark.sparkContext.setCheckpointDir` (HDFS/S3 on
    * a cluster), persisted around the checkpoint job so the frame is not
    * computed twice (the starComponents persist-before-checkpoint
    * discipline). Values are identical either way — only failure-recovery
    * durability changes.
    */
  private val ReliablePin: Boolean =
    sys.env.get("SPARK_GRAFT_RELIABLE_PIN").exists(v => v.trim == "1" || v.trim.equalsIgnoreCase("true"))

  def pin(df: DataFrame): DataFrame =
    if (!ReliablePin) df.localCheckpoint()
    else {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "SPARK_GRAFT_RELIABLE_PIN=1 needs spark.sparkContext.setCheckpointDir " +
          "pointed at durable storage (HDFS/S3) — that durability is the point")
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = df.checkpoint()
      df.unpersist(false)
      out
    }
}

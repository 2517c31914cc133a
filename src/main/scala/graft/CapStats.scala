package graft

/** Session-wide census of candidate-cap engagements (the no-silent-caps
  * discipline, r15): every bucketed/blocked candidate join that trims its
  * candidate side — the df caps ([[graft.operators.TierCSim]]'s
  * `dfCapKept`) and the md5-head occupancy caps (`headCapKept`) — records
  * how many rows/keys it excluded here, in addition to the WARN log line.
  * Zero is recorded too, so a test can distinguish "cap checked, nothing
  * dropped" from "cap never consulted". Driver-side only (caps are
  * evaluated by driver-side counts over persisted frames, never inside
  * tasks), so a plain concurrent map is the right tool.
  */
object CapStats {
  private val drops = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** Record the latest engagement for `tag` (last write wins — each query
    * run re-derives its own count; accumulation across runs would make
    * the number meaningless).
    */
  def record(tag: String, dropped: Long): Unit = drops.put(tag, dropped)

  // ---- async engagement counts (r18, guide §2.6 overlap-independent-jobs)
  //
  // The cap counts are logging/audit side-channels: no query RESULT depends
  // on them, but each used to run as an eager driver-blocking job INSIDE
  // the operator builder — serialized before the main action's Catalyst
  // planning even started (measured 0.3-0.8 s per cap-bearing query). Run
  // on a small daemon pool instead, the count job overlaps the main
  // query's planning/codegen and (where both touch the same persisted
  // frame) its cache build. The no-silent-caps CONTRACT is unchanged:
  // every read path ([[lastDrop]], [[snapshot]]) and the cache sweep
  // (CacheRegistry.releaseAll — always called before the persisted frames
  // the counts scan are dropped) first [[await]]s completion, so by the
  // time anyone can observe the query's result or the stats, the count has
  // run, been recorded, and WARNed. Failures are not swallowed: await
  // rethrows the first one with its tag.
  private val pending =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, java.util.concurrent.Future[_])]()
  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(2,
    (r: Runnable) => {
      val t = new Thread(r, "capstats-async")
      t.setDaemon(true)
      t
    })

  /** Submit `count` for `tag` on the background pool; on completion the
    * result is [[record]]ed and, when positive, passed to `warn`.
    */
  def recordAsync(tag: String)(count: => Long)(warn: Long => Unit): Unit = {
    val fut = pool.submit(new Runnable {
      override def run(): Unit = {
        val n = count
        record(tag, n)
        if (n > 0) warn(n)
      }
    })
    pending.add(tag -> fut)
  }

  /** Drain every outstanding async count (rethrowing the first failure,
    * named by its tag). Idempotent; called by every stats read and by
    * CacheRegistry.releaseAll before it unpersists the frames the counts
    * scan.
    */
  def await(): Unit = {
    var entry = pending.poll()
    while (entry != null) {
      val (tag, fut) = entry
      try fut.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw new RuntimeException(s"CapStats async count for '$tag' failed", e.getCause)
      }
      entry = pending.poll()
    }
  }

  /** The most recent drop count for `tag`, if that cap has been consulted
    * this JVM.
    */
  def lastDrop(tag: String): Option[Long] = { await(); Option(drops.get(tag)) }

  /** Snapshot of every consulted cap — for logging/diagnostics. */
  def snapshot(): Map[String, Long] = {
    await()
    import scala.jdk.CollectionConverters._
    drops.asScala.toMap
  }

  def clear(): Unit = { await(); drops.clear() }
}

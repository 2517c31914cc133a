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

  /** The most recent drop count for `tag`, if that cap has been consulted
    * this JVM.
    */
  def lastDrop(tag: String): Option[Long] = Option(drops.get(tag))

  /** Snapshot of every consulted cap — for logging/diagnostics. */
  def snapshot(): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    drops.asScala.toMap
  }

  def clear(): Unit = drops.clear()
}

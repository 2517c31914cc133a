package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-group convex hull as a mergeable typed [[Aggregator]] — the
  * ST_ConvexHull analogue (SURVEY.md §2 A11 extension; the reference's
  * PostGIS habitat implies hull/extent summaries [UPSTREAM-UNVERIFIED —
  * empty checkout, SURVEY.md §0]).
  *
  * Scale design: the hull is a *mergeable summary* — hull(A ∪ B) =
  * hull(hull(A) ∪ hull(B)) — so it aggregates with map-side partial
  * combine like any sum: each partition keeps at most its local hull (plus
  * a small insert buffer), merge concatenates and re-hulls. State is
  * O(hull size), not O(group size); a 10^9-point group with a 40-vertex
  * hull carries 40 points between stages.
  *
  * Determinism: inputs are INTEGER grid coordinates (callers quantize,
  * e.g. round(value*100)), so every cross product is an exact Long — no
  * floating-point sign errors — and the strict hull vertex set is unique
  * regardless of partitioning or merge order. A point discarded anywhere
  * (strictly inside a partial hull, or interior-collinear) can never be a
  * strict hull vertex of the whole set, so compaction is path-independent.
  * Output is the canonical cycle (start = lexicographic min, counter-
  * clockwise) plus the exact integer doubled area (shoelace).
  */
object Hull {

  /** Monotone chain over interleaved [x0,y0,x1,y1,...]; returns the strict
    * hull as the same interleaved encoding, CCW from the lexicographic min.
    * Collinear edge points are dropped; degenerate inputs (all collinear)
    * yield the 2-point segment, a single point, or empty.
    */
  def hullOf(pts: Array[Long]): Array[Long] = {
    val n = pts.length / 2
    if (n <= 1) return pts.clone()
    // sort lexicographically, dedup
    val idx = Array.tabulate(n)(i => (pts(2 * i), pts(2 * i + 1))).distinct.sorted
    val m = idx.length
    if (m == 1) return Array(idx(0)._1, idx(0)._2)
    def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)): Long =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val h = new Array[(Long, Long)](2 * m)
    var k = 0
    // lower hull
    var i = 0
    while (i < m) {
      while (k >= 2 && cross(h(k - 2), h(k - 1), idx(i)) <= 0) k -= 1
      h(k) = idx(i); k += 1; i += 1
    }
    // upper hull
    val lower = k + 1
    i = m - 2
    while (i >= 0) {
      while (k >= lower && cross(h(k - 2), h(k - 1), idx(i)) <= 0) k -= 1
      h(k) = idx(i); k += 1; i -= 1
    }
    // h(0..k-2) is the CCW cycle starting at the lexicographic min
    val out = new Array[Long](2 * (k - 1))
    i = 0
    while (i < k - 1) { out(2 * i) = h(i)._1; out(2 * i + 1) = h(i)._2; i += 1 }
    out
  }

  /** Exact doubled shoelace area of the hull cycle (0 for degenerate). */
  def area2(hull: Array[Long]): Long = {
    val n = hull.length / 2
    if (n < 3) return 0L
    var s = 0L
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      s += hull(2 * i) * hull(2 * j + 1) - hull(2 * j) * hull(2 * i + 1)
      i += 1
    }
    math.abs(s)
  }

  final case class HullStats(n_hull: Int, area2: Long, hull: Array[Long])

  /** Compact once the insert buffer outgrows this many points. */
  private val CompactAt = 256

  final class HullAgg extends Aggregator[Array[Long], Array[Long], HullStats] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(b: Array[Long], p: Array[Long]): Array[Long] = {
      val appended = b ++ p
      if (appended.length / 2 > CompactAt) hullOf(appended) else appended
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = hullOf(a ++ b)
    override def finish(b: Array[Long]): HullStats = {
      val h = hullOf(b)
      HullStats(h.length / 2, area2(h), h)
    }
    override def bufferEncoder: Encoder[Array[Long]] = arrayLongEnc
    override def outputEncoder: Encoder[HullStats] = Encoders.product[HullStats]
  }

  private val arrayLongEnc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Aggregate column over an array(x, y) Long-pair column. */
  def hullAgg(xy: Column): Column = udaf(new HullAgg).apply(xy)
}

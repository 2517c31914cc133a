package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min Sketch over long keys as a typed [[Aggregator]] — the
  * "novel sketch as a custom aggregate" extension point (SURVEY.md §7.3):
  * heavy-hitter / frequency estimation in one pass with a fixed-size
  * state, where an exact groupBy count would shuffle every distinct key.
  *
  * Properties the 100 TB posture needs, by construction:
  *  - merge is elementwise addition — associative AND commutative, so
  *    partial aggregation (map-side combine) applies and neither shuffle
  *    order nor partition count can change the result (bit-deterministic,
  *    unlike sample- or order-sensitive sketches);
  *  - hashes are fixed-seed (seed = row index of the sketch), no RNG;
  *  - standard CMS guarantee: estimate(k) >= true(k) always, and
  *    estimate(k) <= true(k) + (e/width)·N with probability
  *    1 - (1/e)^depth. Width/depth trade memory for error exactly like
  *    the reference sizing rules from the Cormode-Muthukrishnan paper.
  */
object CountMin {

  /** depth x width counter matrix, flattened row-major. */
  final case class Sketch(depth: Int, width: Int, counters: Array[Long]) {
    def estimate(key: Long): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = counters(r * width + CountMin.bucket(key, r, width))
        if (c < best) best = c
        r += 1
      }
      best
    }
  }

  private[functions] def bucket(key: Long, row: Int, width: Int): Int = {
    // fixed-seed 64-bit mix (splitmix64 finalizer) per sketch row
    var z = key + 0x9e3779b97f4a7c15L * (row + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= z >>> 31
    (((z % width) + width) % width).toInt
  }

  final class CmsAggregator(depth: Int, width: Int)
      extends Aggregator[Long, Array[Long], Sketch] {
    def zero: Array[Long] = new Array[Long](depth * width)
    def reduce(b: Array[Long], key: Long): Array[Long] = {
      var r = 0
      while (r < depth) {
        b(r * width + bucket(key, r, width)) += 1L
        r += 1
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Sketch = Sketch(depth, width, b)
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelp.arrayLong
    def outputEncoder: Encoder[Sketch] = Encoders.product[Sketch]
  }

  private object ExpressionEncoderHelp {
    val arrayLong: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
}

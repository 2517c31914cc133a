package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog over long keys as a typed [[Aggregator]] — the replayable
  * sibling of Spark's built-in `approx_count_distinct` (b13_agg_hll stays
  * no-oracle because Spark's HLL++ hashes with an engine-internal xxhash;
  * this sketch hashes with the same splitmix64 finalizer [[CountMin]]
  * already replays in DuckDB HUGEINT SQL, so the whole estimate —
  * registers, harmonic sum, alpha correction — hash-matches the oracle).
  *
  * Determinism by construction (the CountMin discipline):
  *  - merge is elementwise register MAX — associative, commutative AND
  *    idempotent, so partial aggregation applies and neither shuffle
  *    order, partition count, nor speculative re-execution can change a
  *    register (stronger than CMS: even double-counting a row is a no-op);
  *  - hash is the fixed-constant splitmix64 finalizer, no RNG;
  *  - the estimate is INTEGER-ONLY: Z is kept as the exact integer
  *    Σ 2^(MaxRho − M[j]) (≤ m·2^59 < 2^65, a BigInt here / HUGEINT in
  *    SQL) and alpha enters as the exact rational 70934/100000 (the
  *    standard α₆₄ = 0.7213/(1 + 1.079/m) rounded to 5 digits — OUR spec
  *    constant, identical on both engines), so no float ever appears.
  *
  * Register layout (standard HLL with a trailing-zero rank — trailing and
  * leading zeros of a uniform hash are identically distributed, and
  * trailing replays in one SQL expression via `bit_count((w & -w) - 1)`):
  *   h   = splitmix64(key)        (64 uniform bits)
  *   j   = h & (m-1)              (low P bits → register)
  *   w   = h >>> P                (remaining 64-P bits)
  *   rho = ntz(w) + 1, or MaxRho when w == 0
  *
  * Standard HLL error: 1.04/√m ≈ 13 % at m = 64 — asserted in ScalaTest;
  * the oracle checks bit-equality, not accuracy.
  */
object Hll {

  val P: Int = 6
  val M: Int = 1 << P // 64 registers
  /** rank cap: w has 64-P = 58 bits, so ntz(w)+1 ∈ [1,58]; w == 0 ⇒ 59. */
  val MaxRho: Int = 59

  /** splitmix64 finalizer, seed-add C1 (the [[CountMin.bucket]] row-0 chain,
    * replayed stage-for-stage by the b13d oracle's HUGEINT CTEs). */
  def hash(key: Long): Long = {
    var z = key + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def register(h: Long): Int = (h & (M - 1)).toInt

  def rho(h: Long): Int = {
    val w = h >>> P
    if (w == 0L) MaxRho else java.lang.Long.numberOfTrailingZeros(w) + 1
  }

  final case class Summary(est: Long, vEmpty: Long)

  /** Raw HLL estimate ⌊α·m²/Σ2^−M[j]⌋ in exact integer arithmetic:
    * ⌊70934·m²·2^MaxRho / (100000·Z)⌋ with Z = Σ 2^(MaxRho−M[j]).
    * No small-range (linear-counting) switch: ln() is not bit-replayable,
    * so the raw estimate is the contract and `vEmpty` is emitted for the
    * caller to apply any correction — the oracle checks both fields.
    */
  def summarize(regs: Array[Int]): Summary = {
    var z = BigInt(0)
    var v = 0L
    var j = 0
    while (j < regs.length) {
      if (regs(j) == 0) v += 1L
      z += BigInt(1) << (MaxRho - regs(j))
      j += 1
    }
    val num = BigInt(70934) * M * M * (BigInt(1) << MaxRho)
    Summary((num / (BigInt(100000) * z)).toLong, v)
  }

  final class HllAggregator extends Aggregator[Long, Array[Int], Summary] {
    def zero: Array[Int] = new Array[Int](M)
    def reduce(b: Array[Int], key: Long): Array[Int] = {
      val h = hash(key)
      val j = register(h)
      val r = rho(h)
      if (r > b(j)) b(j) = r
      b
    }
    def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
      var j = 0
      while (j < M) { if (y(j) > x(j)) x(j) = y(j); j += 1 }
      x
    }
    def finish(b: Array[Int]): Summary = summarize(b)
    def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Summary] = Encoders.product[Summary]
  }
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic Bloom filter over strings, built as a typed commutative
  * [[Aggregator]] (merge = bitwise OR, so the result is bit-identical on any
  * partitioning / merge order — same discipline as CountMin.scala).
  *
  * Scale role: the cheap membership pre-filter for incremental dedup against
  * an existing corpus. At 100 TB the "store" side of a fingerprint anti-join
  * is far too big to shuffle per increment; a Bloom filter of the store's
  * fingerprints is a few GB at most (10 bits/key ≈ 1% FPR), builds with one
  * map-side-combined pass, broadcasts once, and rejects the overwhelming
  * majority of incoming keys without any join. Only the Bloom-positive
  * survivors (true matches + ~1% false positives) proceed to the exact
  * verification join, shrinking its probe side by ~99%. No false negatives:
  * a Bloom-rejected key is definitively absent, so composing
  * `bloom-reject UNION (bloom-pass ANTI-JOIN store)` is *exactly* the plain
  * anti-join — which is what lets `c1e_bloom_dedup` keep a DuckDB oracle.
  *
  * Hashing: FNV-1a 64 over UTF-8 bytes for h1; h2 re-folds h1 through a
  * 64-bit avalanche (splitmix64 finalizer). Probe i uses the standard
  * double-hash schedule h1 + i*h2 (Kirsch–Mitzenmacher), mod m.
  */
object Bloom {

  /** FNV-1a 64-bit. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — decorrelates h2 from h1. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Bit positions probed for `s` in a filter of `mBits` bits. */
  def probes(s: String, mBits: Int, k: Int): Array[Int] = {
    val h1 = fnv1a64(s)
    val h2 = mix64(h1) | 1L // odd => full-period schedule
    Array.tabulate(k) { i =>
      val h = h1 + i * h2
      // floorMod onto [0, mBits)
      ((h % mBits + mBits) % mBits).toInt
    }
  }

  def contains(bits: Array[Long], mBits: Int, k: Int, s: String): Boolean =
    probes(s, mBits, k).forall(p => (bits(p >>> 6) & (1L << (p & 63))) != 0L)

  /** Typed aggregator: strings -> packed bit array (Array[Long]). */
  final class BloomAgg(mBits: Int, k: Int) extends Aggregator[String, Array[Long], Array[Long]] {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    private val words = mBits / 64

    override def zero: Array[Long] = new Array[Long](words)

    override def reduce(b: Array[Long], s: String): Array[Long] = {
      if (s != null) {
        val ps = probes(s, mBits, k)
        var i = 0
        while (i < ps.length) {
          val p = ps(i)
          b(p >>> 6) |= (1L << (p & 63))
          i += 1
        }
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = Bloom.arrayLongEnc
    override def outputEncoder: Encoder[Array[Long]] = Bloom.arrayLongEnc
  }

  private val arrayLongEnc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Column aggregate building the filter over a string column. */
  def bloomAgg(mBits: Int, k: Int): Column => Column = {
    val agg = udaf(new BloomAgg(mBits, k))
    c => agg(c)
  }

  /** Column predicate: does `s` hit every probed bit of `bits`? */
  def bloomContains(mBits: Int, k: Int): (Column, Column) => Column = {
    val f = org.apache.spark.sql.functions.udf {
      (bits: Array[Long], s: String) => s != null && bits != null && contains(bits, mBits, k, s)
    }
    (bits, s) => f(bits, s)
  }
}

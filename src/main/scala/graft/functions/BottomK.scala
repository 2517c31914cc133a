package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k uniform-sample quantile sketch as a typed [[Aggregator]] —
  * the deterministic, oracle-replayable sibling of `percentile_approx`
  * (b13b stays no-oracle because Spark's GK summary is merge-order-
  * dependent past its exact regime; this sketch is bit-deterministic at
  * ANY scale by construction).
  *
  * Design: classic bottom-k (KMV) sampling — every row carries a unique
  * deterministic rank (md5 hex of its primary key, the repo's standard
  * RNG-free draw, cf. c1f_weighted_sample); the sketch keeps the k rows
  * with the SMALLEST ranks, a uniform sample of the group. Quantiles are
  * lower order statistics of the sample: q@p = sample value at 1-based
  * index ⌊(n−1)·p⌋+1 (no interpolation — a selected RAW value, so no
  * float arithmetic to replay). Rank error is the standard bottom-k bound
  * O(1/√k) ≈ 9 % at k = 128, asserted in ScalaTest; the oracle checks
  * bit-equality of (n, p50, p90) per group.
  *
  * Determinism: ranks are unique (injective key → md5 collisions aside,
  * and a 128-bit collision would need ~2^64 rows), so "the k smallest
  * ranks" is a set function of the input set — merge (union-then-trim)
  * is associative and commutative, partial aggregation applies, and
  * partitioning/shuffle order cannot change the sample. State is bounded:
  * the buffer trims to k whenever it doubles, so memory is O(k) and
  * reduce amortizes to O(log k) per row.
  */
object BottomK {

  final case class QSummary(n: Long, p50: Double, p90: Double)

  final class BottomKQuantile(k: Int)
      extends Aggregator[(String, Double), Seq[(String, Double)], QSummary] {

    private def trim(b: Seq[(String, Double)]): Seq[(String, Double)] =
      if (b.length <= k) b else b.sortBy(_._1).take(k)

    def zero: Seq[(String, Double)] = Vector.empty

    def reduce(b: Seq[(String, Double)], x: (String, Double)): Seq[(String, Double)] = {
      val appended = b :+ x
      if (appended.length >= 2 * k) trim(appended) else appended
    }

    def merge(x: Seq[(String, Double)], y: Seq[(String, Double)]): Seq[(String, Double)] =
      trim(x ++ y)

    def finish(b: Seq[(String, Double)]): QSummary = {
      val sample = trim(b)
      val vs = sample.map(_._2).sorted
      val n = vs.length
      if (n == 0) QSummary(0L, Double.NaN, Double.NaN)
      else QSummary(n.toLong, vs((n - 1) / 2), vs((n - 1) * 9 / 10))
    }

    def bufferEncoder: Encoder[Seq[(String, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Double)]]()
    def outputEncoder: Encoder[QSummary] = Encoders.product[QSummary]
  }
}

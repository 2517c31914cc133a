package graft.functions

import scala.util.hashing.MurmurHash3

/** Deterministic MinHash + LSH banding for near-duplicate text detection
  * (SURVEY.md §2 C2; north-star LLM-pipeline operator).
  *
  * Design for 100 TB: the signature is computed per-document (map-side,
  * embarrassingly parallel), then documents are exploded into (band_id,
  * band_hash) buckets and candidate pairs are generated ONLY within a
  * bucket via a self-join on the bucket key — never an all-pairs cross
  * join. Bucket-key cardinality grows with the corpus, so the join is a
  * well-distributed shuffle; verification (exact Jaccard) touches only
  * candidate pairs.
  *
  * All hashing is scala.util.hashing.MurmurHash3 with fixed seeds — stable
  * across JVMs and runs, so declared queries over signatures hash-match.
  */
object MinHash {
  val NumHashes = 32
  val Bands = 8
  val RowsPerBand: Int = NumHashes / Bands
  val ShingleSize = 3

  /** Word k-shingles of a token sequence; documents shorter than k collapse
    * to a single shingle of the whole text so they still get a signature.
    */
  def shingles(tokens: Seq[String], k: Int = ShingleSize): Seq[String] =
    if (tokens.length <= k) Seq(tokens.mkString(" "))
    else tokens.sliding(k).map(_.mkString(" ")).toSeq

  /** 32-slot MinHash signature: slot i = min over shingles of murmur3(s, seed_i). */
  def signature(sh: Seq[String]): Array[Int] = {
    val sig = Array.fill(NumHashes)(Int.MaxValue)
    sh.foreach { s =>
      var i = 0
      while (i < NumHashes) {
        val h = MurmurHash3.stringHash(s, 0x9747b28c + i * 0x5bd1e995)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** One hash per band over its signature rows → LSH bucket keys. */
  def bandHashes(sig: Array[Int]): Array[Int] = {
    val out = new Array[Int](Bands)
    var b = 0
    while (b < Bands) {
      out(b) = MurmurHash3.arrayHash(
        java.util.Arrays.copyOfRange(sig, b * RowsPerBand, (b + 1) * RowsPerBand),
        0x85ebca6b)
      b += 1
    }
    out
  }

  /** Exact Jaccard similarity of two distinct-token sets (verification step). */
  def jaccard(a: Set[String], b: Set[String]): Double = {
    if (a.isEmpty && b.isEmpty) 1.0
    else (a intersect b).size.toDouble / (a union b).size.toDouble
  }
}

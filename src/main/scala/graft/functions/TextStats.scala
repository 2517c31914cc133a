package graft.functions

/** Text-analysis primitives for the LLM-data-pipeline tier (SURVEY.md §2
  * Tier C; north-star `BASELINE.json:6`): stopword/marker tables shared by
  * the quality-scoring and language-ID operators, and a winnowing
  * rolling-hash document fingerprinter.
  *
  * Everything here is deterministic pure-Scala (fixed constants, no RNG),
  * so declared queries over these functions are stable across runs,
  * partitionings, and JVMs.
  */
object TextStats {

  /** Minimal English stopword set used by the quality score. */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "and", "in", "is", "it")

  /** Per-language marker tokens for the n-gram-heuristic language ID.
    * Ordered: ties break toward the earlier entry (deterministic argmax).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "de" -> Seq("der", "die", "das"),
    "es" -> Seq("el", "la"),
    "fr" -> Seq("le", "les"),
    "zh" -> Seq("的", "是"),
  )

  /** Karp-Rabin rolling hash over char k-grams, then winnowing: slide a
    * w-hash window and keep each window's minimum (rightmost tie-break),
    * deduplicating consecutive picks. Standard MOSS-style fingerprinting:
    * any shared substring of length >= k + w - 1 guarantees a shared
    * fingerprint. Base/mod fixed for determinism; Long overflow arithmetic
    * is itself deterministic mod 2^64.
    */
  def winnow(text: String, k: Int = 8, w: Int = 4): Array[Long] = {
    val s = text
    if (s.length < k) return Array(fullHash(s))
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    var h = 0L
    var pow = 1L // Base^(k-1)
    var i = 0
    while (i < k) {
      h = h * Base + s.charAt(i)
      if (i < k - 1) pow = pow * Base
      i += 1
    }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastIdx = -1
    var start = 0
    val lastWindow = math.max(0, n - w)
    while (start <= lastWindow) {
      val end = math.min(start + w, n)
      var minIdx = start
      var j = start + 1
      while (j < end) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      if (minIdx != lastIdx) {
        out += hashes(minIdx)
        lastIdx = minIdx
      }
      start += 1
    }
    out.toArray
  }

  /** Allocation-free winnow summary: (pick count, min, max) in one pass.
    * The c4_winnow query only needs the summary, and [[winnow]]'s boxed
    * ArrayBuffer + toArray was the avoidable per-row cost the r10 bench
    * flagged (VERDICT r10 #5). Must pick EXACTLY the hashes [[winnow]]
    * picks — TextStatsSpec pins the equivalence property.
    */
  def winnowStats(text: String, k: Int = 8, w: Int = 4): (Int, Long, Long) = {
    val s = text
    if (s.length < k) { val h = fullHash(s); return (1, h, h) }
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < k) {
      h = h * Base + s.charAt(i)
      if (i < k - 1) pow = pow * Base
      i += 1
    }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    var cnt = 0
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var lastIdx = -1
    var start = 0
    val lastWindow = math.max(0, n - w)
    while (start <= lastWindow) {
      val end = math.min(start + w, n)
      var minIdx = start
      var j = start + 1
      while (j < end) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      if (minIdx != lastIdx) {
        val v = hashes(minIdx)
        cnt += 1
        if (v < mn) mn = v
        if (v > mx) mx = v
        lastIdx = minIdx
      }
      start += 1
    }
    (cnt, mn, mx)
  }

  private val Base = 257L

  private def fullHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = h * Base + s.charAt(i); i += 1 }
    h
  }

  /** 64-bit token hash for SimHash: first 8 md5 bytes (r11, replaces the
    * two murmur32 halves) — so bit b of the hash is a fixed nibble-shift
    * of one md5 hex char and the whole signature replays in DuckDB SQL
    * (strpos hex parse → per-bit votes → HUGEINT bit assembly), converting
    * `c2_simhash`/`c2_simhash_pairs` from declared-no-oracle to
    * hash-checked. Locality is unchanged: any uniform 64-bit token hash
    * gives the sign-sum concentration SimHash relies on.
    */
  def tokenHash64(t: String): Long = MinHash.md5Long(t)

  /** 64-bit SimHash over a token multiset: per bit, +1 for set / -1 for
    * clear across all token hashes; result bit = sign. Near-identical
    * documents land within a small Hamming distance.
    */
  def simHash(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = tokenHash64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Deflate(level 6) byte length of the UTF-8 text — the compression-
    * ratio quality signal. A fresh Deflater per call with fixed level and
    * default strategy is the fixed zlib algorithm: bit-deterministic
    * across JVMs, rows, and partitionings.
    */
  /** Character-level Shannon entropy, integer-quantized for exact replay:
    * each distinct character contributes floor(p·ln(p)·1e9) as a Long —
    * the identical IEEE chain DuckDB computes from its per-char GROUP BY
    * counts — and the per-doc sum of integers is iteration-order-free, so
    * the map-side UDF and the oracle's explode/agg path land on the same
    * bits. Returns (n_chars, n_distinct_chars, ent_e9 = −Σ floor terms).
    */
  def charEntropyE9(s: String): (Long, Long, Long) = {
    val n = s.length
    if (n == 0) return (0L, 0L, 0L)
    val counts = new java.util.HashMap[Char, Long]()
    var i = 0
    while (i < n) {
      counts.merge(s.charAt(i), 1L, (a, b) => a + b)
      i += 1
    }
    var acc = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      val p = c.toDouble / n.toDouble
      acc += math.floor(p * math.log(p) * 1000000000.0).toLong
    }
    (n.toLong, counts.size.toLong, -acc)
  }

  def deflateLen(text: String): Long = {
    val d = new java.util.zip.Deflater(6, false)
    d.setInput(text.getBytes("UTF-8"))
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }
}

package graft.functions

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
  * Hash family (r11, replaces the r1 murmur3 family to make the operator
  * ORACLE-REPLAYABLE — the last no-oracle near-dup queries): the classic
  * linear-permutation MinHash construction over one md5-derived base per
  * shingle,
  *
  *   base(s)  = first 15 hex chars of md5(s) as an unsigned 60-bit int
  *   v_i(s)   = (A_i · base(s) + B_i) mod 2^64,  A_i odd
  *   slot_i   = min over shingles of v_i  (UNSIGNED 64-bit order)
  *
  * One md5 + 32 multiply-adds per shingle (cheaper map-side than the
  * murmur3 version's 32 string hashes per shingle), and every step
  * replays exactly in DuckDB SQL: md5 is md5, the 15-hex-char parse is a
  * strpos chain, A_i·base + B_i ≤ (2^62)(2^60) + 2^64 < 2^127 fits
  * HUGEINT so `% 2^64` reproduces the JVM's Long wrap bit-for-bit (the
  * `c4_winnow` / `b13c_countmin` precedent), and unsigned min is HUGEINT
  * MIN. Band keys are md5 over the band's slot minima rendered as
  * unsigned decimal — string_agg-replayable. A_i < 2^62 keeps the
  * HUGEINT product in range; losing 2 bits off a 64-bit multiplier does
  * not weaken the family (base has 60 bits of entropy, A_i stays odd so
  * the map is a bijection mod 2^64).
  */
object MinHash {
  val NumHashes = 32
  val Bands = 8
  val RowsPerBand: Int = NumHashes / Bands
  val ShingleSize = 3

  /** splitmix64 finalizer — the repo-standard constant generator (see
    * [[Bloom]], [[CountMin]]); here it derives the fixed A_i/B_i tables.
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Slot multipliers: odd, < 2^62 (HUGEINT-range guard, see class doc). */
  val A: Array[Long] = Array.tabulate(NumHashes)(i => (mix(i.toLong) & ((1L << 62) - 1)) | 1L)

  /** Slot offsets: full unsigned 64-bit range. */
  val B: Array[Long] = Array.tabulate(NumHashes)(i => mix(1000L + i))

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 bytes as a big-endian Long — bit-identical to parsing the
    * first 16 hex chars of the md5 hex string as unsigned.
    */
  def md5Long(s: String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(bytes, 0, 8).getLong
  }

  /** 60-bit shingle base = first 15 hex chars of md5 (drop the last nibble
    * of the first 16 — i.e. the top 8 bytes >>> 4), always non-negative.
    */
  def base60(s: String): Long = md5Long(s) >>> 4

  /** md5 hex string (band-key compaction; both engines print lowercase hex). */
  def md5Hex(s: String): String = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Word k-shingles of a token sequence; documents shorter than k collapse
    * to a single shingle of the whole text so they still get a signature.
    */
  def shingles(tokens: Seq[String], k: Int = ShingleSize): Seq[String] =
    if (tokens.length <= k) Seq(tokens.mkString(" "))
    else tokens.sliding(k).map(_.mkString(" ")).toSeq

  /** 32-slot MinHash signature: slot i = unsigned-min over shingles of
    * (A_i · base60(s) + B_i) mod 2^64 (Long overflow IS the mod).
    */
  def signature(sh: Seq[String]): Array[Long] = {
    val sig = Array.fill(NumHashes)(-1L) // unsigned max
    sh.foreach { s =>
      val b = base60(s)
      var i = 0
      while (i < NumHashes) {
        val v = A(i) * b + B(i)
        if (java.lang.Long.compareUnsigned(v, sig(i)) < 0) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** One md5 key per band over its slot minima (unsigned decimal, '|'-joined
    * — the exact string DuckDB's string_agg over HUGEINTs produces).
    */
  def bandHashes(sig: Array[Long]): Array[String] = {
    val out = new Array[String](Bands)
    var b = 0
    while (b < Bands) {
      val s = (b * RowsPerBand until (b + 1) * RowsPerBand)
        .map(i => java.lang.Long.toUnsignedString(sig(i))).mkString("|")
      out(b) = md5Hex(s)
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

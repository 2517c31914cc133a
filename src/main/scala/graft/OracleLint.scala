package graft

/** Static guard over the oracle SQL for DuckDB result-type traps.
  *
  * The driver's correctness hash is TYPE-sensitive: a DuckDB column that
  * comes out HUGEINT (int128) hash-mismatches Spark's BIGINT even when
  * every value is equal. DuckDB's window `SUM` over integers returns
  * HUGEINT unless cast, which cost two red rows in round 5
  * (`b17b_rolling_z`, `c4_bins`) — the same bug family as SURVEY §7.4
  * rule 10. DuckDB itself is driver-side only (not on this classpath), so
  * the live `DESCRIBE`-typed check lives in tools/check.py; this object is
  * the static engine-side guard that `sbt test` and the Verify dump both
  * run: every window SUM in every oracle SQL must be wrapped directly in a
  * CAST, no exceptions.
  */
object OracleLint {

  /** Violations as (queryName, snippet) pairs; empty = clean. */
  def violations(oracles: Map[String, String]): Seq[(String, String)] =
    oracles.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      uncastWindowSums(sql).map(snip => name -> snip)
    }

  /** Offsets of `sum(...) over` occurrences not directly preceded by
    * `cast(`; returns a context snippet per hit.
    */
  private[graft] def uncastWindowSums(sql: String): Seq[String] = {
    val lower = sql.toLowerCase
    val hits = scala.collection.mutable.ArrayBuffer[String]()
    var i = lower.indexOf("sum")
    while (i >= 0) {
      val afterKw = skipWs(lower, i + 3)
      if (afterKw < lower.length && lower.charAt(afterKw) == '(' &&
          !Character.isLetterOrDigit(if (i == 0) ' ' else lower.charAt(i - 1)) &&
          (if (i == 0) true else lower.charAt(i - 1) != '_')) {
        val close = matchParen(lower, afterKw)
        if (close > 0) {
          val afterParen = skipWs(lower, close + 1)
          if (lower.regionMatches(afterParen, "over", 0, 4)) {
            // walk back over whitespace before `sum`; a compliant oracle has
            // `cast(` ending exactly there
            val before = lower.substring(0, i).reverse.dropWhile(_.isWhitespace).reverse
            if (!before.endsWith("cast(")) {
              val from = math.max(0, i - 10)
              val to = math.min(sql.length, close + 30)
              hits += sql.substring(from, to).replaceAll("\\s+", " ")
            }
          }
        }
      }
      i = lower.indexOf("sum", i + 3)
    }
    hits.toSeq
  }

  private def skipWs(s: String, from: Int): Int = {
    var j = from
    while (j < s.length && s.charAt(j).isWhitespace) j += 1
    j
  }

  /** Index of the paren matching s(open), or -1. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var j = open
    while (j < s.length) {
      val c = s.charAt(j)
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return j }
      j += 1
    }
    -1
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The static half of the oracle-type gate (the live DESCRIBE half is in
  * tools/check.py, DuckDB being driver-side only). Round 5 lost two rows to
  * DuckDB window SUMs returning HUGEINT — type-only hash mismatches with
  * every value equal. The rule is blanket on purpose: even an internal,
  * consumed-not-output window SUM gets cast, so the lint needs no
  * exception list that could rot.
  */
class OracleLintSpec extends AnyFunSuite {

  test("detects an uncast window SUM") {
    val bad = "SELECT SUM(x) OVER (PARTITION BY k ORDER BY t) AS s FROM t"
    assert(OracleLint.uncastWindowSums(bad).nonEmpty)
  }

  test("accepts a cast window SUM and ignores plain aggregates") {
    val ok = """SELECT CAST(SUM(x) OVER (PARTITION BY k) AS BIGINT) AS s,
                SUM(y) AS plain_agg FROM t GROUP BY k"""
    assert(OracleLint.uncastWindowSums(ok).isEmpty)
  }

  test("handles nested parens inside the SUM argument") {
    val bad = "SELECT SUM(a*(b+c)) OVER win AS s FROM t WINDOW win AS (ORDER BY t)"
    assert(OracleLint.uncastWindowSums(bad).nonEmpty)
    val ok = "SELECT CAST(SUM(a*(b+c)) OVER win AS BIGINT) AS s FROM t WINDOW win AS (ORDER BY t)"
    assert(OracleLint.uncastWindowSums(ok).isEmpty)
  }

  test("every declared oracle SQL is free of uncast window SUMs") {
    val v = OracleLint.violations(SparkEntry.oracleSql)
    assert(v.isEmpty, v.map { case (n, s) => s"$n: $s" }.mkString("\n"))
  }
}

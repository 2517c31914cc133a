package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle COST gate (VERDICT r12 #1/#2): round 12's driver correctness
  * artifact came back EMPTY because two oracle SQLs — the BPE train/encode
  * 12-round CTE chains — took 903.8 s and 506.8 s in DuckDB at sf0.01,
  * starving the other 298 oracles of the gate's budget. A correctness gate
  * the driver cannot finish is a correctness gate the engine does not
  * have, so oracle RUNTIME is now a tested property: this spec times every
  * declared oracle's SQL in DuckDB at sf0.001 and fails any single oracle
  * over [[PerOracleBudgetS]] — adding a new exponential oracle becomes a
  * red test, not a silent driver timeout.
  *
  * A static shape lint was tried first and rejected: modeled CTE-inlining
  * cost does NOT predict DuckDB 1.0's planner (c2_hits models 4e8 naive
  * inline evaluations yet runs ~9 s at sf0.01, while c4_bpe_train modeled
  * ~8e3 and ran 904 s), so the only honest gate is empirical. DuckDB is
  * driver-side only — never a library dependency — so the spec shells out
  * to the container's python3+duckdb (the exact engine the driver's gate
  * and tools/check.py use) and CANCELS, loudly, where that interpreter is
  * absent; tools/check.py's ORACLE_BUDGET_S enforcement still covers any
  * such environment at sf0.01.
  *
  * Calibration: at sf0.001 the whole 300-oracle sweep runs in ~88 s with
  * the slowest single oracle ~12 s (c2_kcore's iterative peel chain —
  * mostly fixed planning cost: it only grows to ~15 s at sf0.01); the r12
  * killers, replayed un-MATERIALIZED, take minutes at any sf. A 30 s
  * per-oracle budget sits ~2.5x above the healthy ceiling with host-noise
  * headroom, and far below the pathology.
  */
class OracleBudgetSpec extends AnyFunSuite {

  private val PerOracleBudgetS = 30.0

  private def duckdbAvailable: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb").start()
      p.waitFor() == 0
    } catch { case _: java.io.IOException => false }

  test(s"every declared oracle runs in DuckDB at sf0.001 within ${PerOracleBudgetS}s") {
    assume(duckdbAvailable,
      "python3+duckdb (driver-side oracle engine) not on this host — " +
        "oracle timing covered by tools/check.py ORACLE_BUDGET_S instead")
    // ship the oracle map via a temp JSON (same escaping contract as
    // Verify's dump) and time each statement in ONE duckdb process
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.mkString("{", ",", "}")
    val dir = java.nio.file.Files.createTempDirectory("oracle-budget")
    val sqlPath = dir.resolve("oracle_sql.json")
    java.nio.file.Files.writeString(sqlPath, json)
    val script =
      s"""import json, time, duckdb
         |con = duckdb.connect()
         |for t in ['region','nation','customer','supplier','part','orders',
         |          'lineitem','events','documents','embeddings']:
         |    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
         |                f"read_parquet('${SparkFixture.sfDir}/{t}.parquet')")
         |out = {}
         |for name, sql in sorted(json.load(open('$sqlPath')).items()):
         |    t0 = time.time()
         |    try:
         |        con.execute(sql).fetchall()
         |        out[name] = time.time() - t0
         |    except Exception as e:
         |        out[name] = -1.0
         |print(json.dumps(out))
         |""".stripMargin
    val scriptPath = dir.resolve("time_oracles.py")
    java.nio.file.Files.writeString(scriptPath, script)
    val proc = new ProcessBuilder("python3", scriptPath.toString)
      .redirectErrorStream(false).start()
    val outText = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val errText = new String(proc.getErrorStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, s"duckdb timing subprocess failed: $errText")
    // last line is the JSON dict of {name: seconds}; -1 = SQL error (left
    // to the row-level gate to diagnose, not a timing failure)
    val times = outText.trim.linesIterator.toSeq.last
      .stripPrefix("{").stripSuffix("}").split(",(?=\\s*\")").iterator
      .filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split(":(?=[^\"]*$)", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble
      }.toMap
    assert(times.nonEmpty, "timing subprocess produced no measurements")
    assert(times.size == SparkEntry.oracleSql.size,
      s"timed ${times.size} oracles but ${SparkEntry.oracleSql.size} declared")
    val errored = times.filter(_._2 < 0).keys.toSeq.sorted
    assert(errored.isEmpty,
      s"oracle SQL errored in DuckDB (row-level gate will fail too): ${errored.mkString(", ")}")
    val over = times.filter(_._2 > PerOracleBudgetS).toSeq.sortBy(-_._2)
    assert(over.isEmpty,
      "oracles over the per-query budget (gate-blowout risk, the r12 empty-" +
        "artifact family):\n" +
        over.map { case (n, t) => f"  $n%-24s ${t}%.1f s" }.mkString("\n"))
    val total = times.values.sum
    info(f"${times.size} oracles, total ${total}%.1f s, slowest " +
      times.maxBy(_._2)._1 + f" ${times.values.max}%.2f s")
  }
}

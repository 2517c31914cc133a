package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Accuracy + determinism pins for the two replayable sketches (the
  * oracle gate checks bit-equality vs DuckDB; these check the sketch
  * GUARANTEES the oracle can't — estimation error and merge invariance).
  */
class SketchSpec extends AnyFunSuite {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ------------------------------------------------------------------ HLL

  test("HLL: estimate within 3 sigma (1.04/sqrt(64) ~ 13%) across cardinalities") {
    for (n <- Seq(500, 2000, 20000)) {
      val agg = new Hll.HllAggregator
      val regs = (1L to n.toLong).foldLeft(agg.zero)(agg.reduce)
      val est = agg.finish(regs).est
      val sigma = 1.04 / math.sqrt(Hll.M)
      assert(math.abs(est - n).toDouble / n < 3 * sigma,
        s"n=$n est=$est err=${math.abs(est - n).toDouble / n}")
    }
  }

  test("HLL: duplicates are a no-op (idempotent reduce) and merge order is irrelevant") {
    val agg = new Hll.HllAggregator
    val keys = (1L to 1000L) ++ (1L to 1000L) // every key twice
    val once = (1L to 1000L).foldLeft(agg.zero)(agg.reduce)
    val twice = keys.foldLeft(agg.zero)(agg.reduce)
    assert(once.sameElements(twice))
    val chunks = (1L to 1000L).grouped(137).toSeq.map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = chunks.reverse.foldLeft(agg.zero)(agg.merge)
    assert(once.sameElements(merged), "merge must be order-invariant")
  }

  test("HLL: rho/register decomposition covers all 64 hash bits") {
    // j uses the low 6 bits, rho the other 58: reconstructable edge cases
    assert(Hll.register(63L) == 63 && Hll.rho(63L) == Hll.MaxRho) // w == 0
    assert(Hll.rho(64L) == 1) // w = 1 -> ntz 0 -> rho 1
    assert(Hll.rho(128L) == 2) // w = 2 -> rho 2
  }

  // ------------------------------------------------------- bottom-k quantile

  test("bottom-k quantile: rank error bounded by ~3/sqrt(k) on a uniform stream") {
    val k = 128
    val n = 20000
    val agg = new BottomK.BottomKQuantile(k)
    // values 1..n in a scrambled order; md5 ranks over the key
    val rows = (1 to n).map(i => (md5Hex(i.toString), i.toDouble))
    val buf = rows.foldLeft(agg.zero)(agg.reduce)
    val q = agg.finish(buf)
    assert(q.n == k)
    val tol = 3.0 / math.sqrt(k) // ~26% of the range at 3 sigma
    assert(math.abs(q.p50 / n - 0.5) < tol, s"p50=${q.p50}")
    assert(math.abs(q.p90 / n - 0.9) < tol, s"p90=${q.p90}")
  }

  test("bottom-k quantile: partition-invariant (same sample set under any split)") {
    val k = 16
    val agg = new BottomK.BottomKQuantile(k)
    val rows = (1 to 500).map(i => (md5Hex(s"r$i"), i * 1.5))
    val whole = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    val chunks = rows.grouped(61).toSeq.map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = agg.finish(chunks.reverse.foldLeft(agg.zero)(agg.merge))
    assert(whole == merged)
  }

  test("bottom-k quantile: small group (n < k) degrades to the exact order statistic") {
    val agg = new BottomK.BottomKQuantile(128)
    val rows = (1 to 10).map(i => (md5Hex(s"s$i"), i.toDouble))
    val q = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    assert(q.n == 10)
    assert(q.p50 == 5.0) // idx (10-1)/2 + 1 = 5 (1-based) -> value 5.0
    assert(q.p90 == 9.0) // idx (9*9)/10 + 1 = 9 -> value 9.0
  }

  // ------------------------------------------------------------ SQL surface

  test("SketchSql: graft_hll / graft_bottomk_quantile usable from spark.sql, match the API path") {
    val spark = graft.SparkFixture.session
    import spark.implicits._
    SketchSql.register(spark)
    (1L to 3000L).toDF("id").createOrReplaceTempView("sk_ids")
    val sqlEst = spark.sql("SELECT (graft_hll(id)).est AS est FROM sk_ids")
      .collect().head.getLong(0)
    val agg = new Hll.HllAggregator
    val apiEst = agg.finish((1L to 3000L).foldLeft(agg.zero)(agg.reduce)).est
    assert(sqlEst == apiEst, s"SQL $sqlEst vs API $apiEst")
    (1 to 300).map(i => (md5Hex(s"q$i"), i.toDouble)).toDF("r", "v")
      .createOrReplaceTempView("sk_q")
    val row = spark.sql(
      "SELECT (graft_bottomk_quantile(r, v)).n AS n, (graft_bottomk_quantile(r, v)).p50 AS p50 FROM sk_q")
      .collect().head
    assert(row.getLong(0) == 128)
    val bk = new BottomK.BottomKQuantile(128)
    val api = bk.finish((1 to 300).map(i => (md5Hex(s"q$i"), i.toDouble))
      .foldLeft(bk.zero)(bk.reduce))
    assert(row.getDouble(1) == api.p50)
    spark.catalog.dropTempView("sk_ids")
    spark.catalog.dropTempView("sk_q")
  }
}

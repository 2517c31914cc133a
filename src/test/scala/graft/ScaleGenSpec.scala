package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The soak generator's contract: every column a pure function of the
  * row index — bit-reproducible across runs and partitionings — plus the
  * structural properties the scale-sensitive operators feed on (planted
  * near-dups, Heaps vocabulary, clustered embeddings, in-span event
  * times). A drifting generator would silently invalidate every scaling
  * number in BENCH_NOTES.
  */
class ScaleGenSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  test("documents: partition-invariant, near-dups planted, vocab grows by Heaps") {
    import spark.implicits._
    val a = ScaleGen.documents(spark, 700).repartition(7)
      .orderBy($"doc_id").collect().map(_.toString)
    val b = ScaleGen.documents(spark, 700).repartition(3)
      .orderBy($"doc_id").collect().map(_.toString)
    assert(a.toSeq == b.toSeq, "documents not partition-invariant")
    // i≡6 (mod 7) docs are near-copies of i−1: same words + the marker
    val rows = ScaleGen.documents(spark, 700)
      .select($"doc_id", $"text").orderBy($"doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(6L) == rows(5L) + " dupmark", s"'${rows(6L).take(60)}' vs '${rows(5L).take(60)}'")
    assert(rows(13L) == rows(12L) + " dupmark")
    assert(rows(7L) != rows(6L))
    // vocabulary: small corpora use the 200-type floor; larger corpora
    // grow ∝ √N (anchored 200 @ 50k) — sample the plan-time constant by
    // checking a doc's tokens stay inside the expected id range
    val toks = rows(0L).split(" ")
    assert(toks.forall(t => t.startsWith("tok") && t.drop(3).toInt < 200))
    // the distribution is Zipf-headed: tok0's corpus share dwarfs the tail
    val counts = ScaleGen.documents(spark, 700)
      .select(explode(split($"text", " ")).as("t"))
      .groupBy($"t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("tok0") > 10L * counts.getOrElse("tok150", 1L),
      s"tok0=${counts.get("tok0")} tok150=${counts.get("tok150")}")
  }

  test("events/embeddings/lineitem: schema parity with the driver tables, values in contract") {
    import spark.implicits._
    val ev = ScaleGen.events(spark, 500)
    assert(ev.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq("event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
        "event_type" -> "string", "value" -> "double", "props" -> "string"))
    val (mn, mx) = ev.agg(min($"ts").cast("string"), max($"ts").cast("string"))
      .as[(String, String)].head()
    assert(mn >= "2024-01-01" && mx < "2024-01-31", s"[$mn, $mx]")
    val em = ScaleGen.embeddings(spark, 100).collect()
    assert(em.forall(_.getSeq[Float](1).length == 64))
    assert(em.forall(r => r.getAs[Int]("label") == (r.getAs[Long]("vec_id") % 10).toInt))
    // cluster structure: same-label vectors are nearer than cross-label
    def v(i: Int): Seq[Float] = em.find(_.getLong(0) == i).get.getSeq[Float](1)
    def d2(a: Seq[Float], b: Seq[Float]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(d2(v(0), v(10)) < d2(v(0), v(1)), "label-0 pair must beat cross-label")
    val li = ScaleGen.lineitem(spark, 400)
    assert(li.schema.fieldNames.toSeq == Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"))
    // ~4 lines per order, line numbers 1..4
    assert(li.groupBy($"l_orderkey").count().agg(max($"count")).head().getLong(0) == 4L)
  }
}

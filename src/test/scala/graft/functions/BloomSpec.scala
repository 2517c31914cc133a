package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkFixture
import graft.operators.TierCText

class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session
  import spark.implicits._

  private val M = 4096
  private val K = 11

  test("no false negatives: every inserted key is contained") {
    val keys = (0 until 200).map(i => s"key-$i-${i * 31}")
    val agg = new Bloom.BloomAgg(M, K)
    val bits = keys.foldLeft(agg.zero)(agg.reduce)
    assert(keys.forall(k => Bloom.contains(bits, M, K, k)))
  }

  test("false positive rate is bounded at ~16 bits/key") {
    val n = 200 // 4096 bits / 200 keys ≈ 20 bits/key
    val agg = new Bloom.BloomAgg(M, K)
    val bits = (0 until n).map(i => s"in-$i").foldLeft(agg.zero)(agg.reduce)
    val probes = (0 until 10000).map(i => s"out-$i")
    val fp = probes.count(p => Bloom.contains(bits, M, K, p))
    assert(fp < 100, s"FPR ${fp / 10000.0} too high") // < 1% at ~20 bits/key
  }

  test("merge is commutative and partition-invariant (bit-identical)") {
    val keys = (0 until 300).map(i => s"m-$i")
    val agg = new Bloom.BloomAgg(M, K)
    val whole = keys.foldLeft(agg.zero)(agg.reduce)
    // split into 3 chunks, merge in a different order
    val chunks = keys.grouped(100).toSeq.map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = agg.merge(agg.merge(chunks(2), chunks(0)), chunks(1))
    assert(java.util.Arrays.equals(whole, merged))
  }

  test("distributed build matches local build") {
    val keys = (0 until 256).map(i => s"d-$i")
    val agg = new Bloom.BloomAgg(M, K)
    val local = keys.foldLeft(agg.zero)(agg.reduce)
    val viaSpark = keys.toDF("s").repartition(7)
      .agg(Bloom.bloomAgg(M, K)(col("s")))
      .head().getSeq[Long](0).toArray
    assert(java.util.Arrays.equals(local, viaSpark))
  }

  test("bloomIncrement equals the plain anti-join on planted duplicates") {
    val store = (0 until 150).map(i => s"fp-${i * 2}").toDF("fp") // even fps
    val incoming = (0 until 300).map(i => (i.toLong, s"fp-$i")).toDF("id", "fp")
    val got = TierCText.bloomIncrement(store, incoming, "fp")
      .select($"id").as[Long].collect().sorted
    val want = incoming.join(store, Seq("fp"), "left_anti")
      .select($"id").as[Long].collect().sorted
    assert(got.sameElements(want))
    // dups (even fp < 300) are gone; odds and high evens survive
    assert(!got.exists(i => i < 300 && i % 2 == 0))
  }

  test("bloom pre-filter actually prunes: disjoint probe set mostly skips the join") {
    val store = (0 until 500).map(i => s"s-$i")
    val agg = new Bloom.BloomAgg(8192, K)
    val bits = store.foldLeft(agg.zero)(agg.reduce)
    val probeSurvivors = (0 until 500).count(i => Bloom.contains(bits, 8192, K, s"p-$i"))
    assert(probeSurvivors < 25, s"$probeSurvivors of 500 disjoint probes passed the filter")
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Properties}

class MinHashSpec extends AnyFunSuite {
  private def sig(text: String) =
    MinHash.signature(MinHash.shingles(text.split(" ").toSeq))

  test("identical texts → identical signatures and band hashes") {
    val a = sig("the quick brown fox jumps over the lazy dog again and again")
    val b = sig("the quick brown fox jumps over the lazy dog again and again")
    assert(a.toSeq == b.toSeq)
    assert(MinHash.bandHashes(a).toSeq == MinHash.bandHashes(b).toSeq)
  }

  test("near-identical texts collide on at least one band") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok37", "tok37x") // 1 of 60 tokens changed
    val ba = MinHash.bandHashes(sig(base))
    val bb = MinHash.bandHashes(sig(nearDup))
    assert(ba.zip(bb).exists { case (x, y) => x == y })
  }

  test("unrelated texts share no band") {
    val a = MinHash.bandHashes(sig((1 to 60).map(i => s"alpha$i").mkString(" ")))
    val b = MinHash.bandHashes(sig((1 to 60).map(i => s"beta$i").mkString(" ")))
    assert(!a.zip(b).exists { case (x, y) => x == y })
  }

  test("short documents still get a signature") {
    assert(MinHash.shingles(Seq("one")) == Seq("one"))
    assert(MinHash.shingles(Seq("one", "two")) == Seq("one two"))
    assert(sig("one two").length == MinHash.NumHashes)
  }

  test("jaccard basics") {
    assert(MinHash.jaccard(Set("a", "b"), Set("a", "b")) == 1.0)
    assert(MinHash.jaccard(Set("a", "b"), Set("c")) == 0.0)
    assert(MinHash.jaccard(Set("a", "b", "c"), Set("b", "c", "d")) == 0.5)
  }
}

/** Minhash collision fraction estimates Jaccard: statistical property that
  * higher true Jaccard ⇒ (weakly) more matching signature slots.
  */
object MinHashProps extends Properties("MinHash") {
  private val corpus = (1 to 200).map(i => s"w$i")

  property("signature agreement grows with Jaccard") = Prop.forAll(
    Gen.chooseNum(0, 50), Gen.chooseNum(50, 100)) { (fewChanges, manyChanges) =>
    val base = corpus.take(100)
    def mutate(n: Int) = base.take(100 - n) ++ corpus.slice(100, 100 + n)
    def agree(a: Seq[String], b: Seq[String]): Int = {
      val sa = MinHash.signature(MinHash.shingles(a))
      val sb = MinHash.signature(MinHash.shingles(b))
      sa.zip(sb).count { case (x, y) => x == y }
    }
    val closer = agree(base, mutate(fewChanges))
    val farther = agree(base, mutate(manyChanges))
    (fewChanges >= manyChanges) || closer >= farther - 6 // slack: 32-slot estimator noise
  }
}

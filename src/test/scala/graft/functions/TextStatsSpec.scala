package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TextStatsSpec extends AnyFunSuite {

  test("winnow: identical text gives identical fingerprints") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    assert(TextStats.winnow(t).toSeq == TextStats.winnow(t).toSeq)
  }

  test("winnow: shared long substring guarantees shared fingerprints (MOSS property)") {
    val core = "a shared stretch of text that is comfortably longer than k plus w characters"
    val a = "prefix one " + core + " suffix alpha"
    val b = "completely different lead-in " + core + " other tail"
    val fa = TextStats.winnow(a).toSet
    val fb = TextStats.winnow(b).toSet
    assert((fa intersect fb).nonEmpty, "no shared fingerprint for shared substring")
  }

  test("winnow: short text still fingerprints") {
    assert(TextStats.winnow("tiny").length == 1)
  }

  test("winnowStats equals (length, min, max) of winnow on varied inputs") {
    // winnowStats is the allocation-free path c4_winnow actually ships;
    // this property pins it to the reference winnow() picks exactly,
    // including the short-text fullHash arm and heavy-repeat tie-breaking.
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // degenerate: all equal hashes
      "abababababababababababab",       // periodic ties exercise rightmost-min
      "tiny",                            // < k: fullHash arm
      "exactly8",                        // == k: single k-gram
      "numbers 123 and punctuation!?; mixed CASE Text with   spaces",
    )
    cases.foreach { t =>
      val fp = TextStats.winnow(t)
      assert(TextStats.winnowStats(t) == ((fp.length, fp.min, fp.max)),
        s"winnowStats diverged from winnow on: '$t'")
    }
  }

  test("winnow: disjoint texts share no fingerprints") {
    val fa = TextStats.winnow("aaaa bbbb cccc dddd eeee ffff gggg").toSet
    val fb = TextStats.winnow("zzzz yyyy xxxx wwww vvvv uuuu tttt").toSet
    assert((fa intersect fb).isEmpty)
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("simhash: single-token edit stays within small Hamming distance") {
    (20 to 60 by 5).foreach { n =>
      val toks = (1 to n).map(i => s"tok$i")
      val edited = toks.updated(n / 2, "CHANGED")
      val d = hamming(TextStats.simHash(toks), TextStats.simHash(edited))
      assert(d <= 16, s"n=$n hamming=$d")
    }
  }

  test("simhash: unrelated token sets are far apart") {
    val a = TextStats.simHash((1 to 50).map(i => s"alpha$i"))
    val b = TextStats.simHash((1 to 50).map(i => s"beta$i"))
    assert(hamming(a, b) > 10)
  }

  test("simhash/tokenHash64: deterministic across calls") {
    assert(TextStats.tokenHash64("spark") == TextStats.tokenHash64("spark"))
    val toks = Seq("a", "b", "c")
    assert(TextStats.simHash(toks) == TextStats.simHash(toks))
  }

  test("deflateLen: repetitive text compresses far below shuffled-diverse text") {
    val repetitive = "spam ham " * 200
    val diverse = (1 to 400).map(i => s"w${i * 7919 % 997}x${i}").mkString(" ")
    val rRatio = TextStats.deflateLen(repetitive).toDouble / repetitive.length
    val dRatio = TextStats.deflateLen(diverse).toDouble / diverse.length
    assert(rRatio < 0.1 && dRatio > 0.3, s"r=$rRatio d=$dRatio")
  }

  test("deflateLen: deterministic across calls and inputs sizes") {
    val t = "the quick brown fox jumps over the lazy dog " * 50
    assert(TextStats.deflateLen(t) == TextStats.deflateLen(t))
    assert(TextStats.deflateLen("") >= 0L)
    // monotone-ish sanity: doubling repetitive content grows output slowly
    assert(TextStats.deflateLen(t + t) < 2 * TextStats.deflateLen(t))
  }

  // ------------------------------------------------------------ SQL surface

  test("TextSql: the five fingerprint functions usable from spark.sql, match the library path") {
    val spark = graft.SparkFixture.session
    import spark.implicits._
    TextSql.register(spark)
    val texts = Seq(
      "The quick brown Fox jumps  over the lazy dog",
      "key agg row scan slow fast table value part hash",
      "a a a a a a a a a a a a")
    texts.toDF("text").createOrReplaceTempView("tsql")
    val rows = spark.sql(
      """SELECT text, graft_simhash(text) AS sh, graft_minhash(text) AS mh,
        |  graft_minhash_bands(text) AS bands, graft_winnow(text) AS wn,
        |  graft_deflate_len(text) AS dl FROM tsql""".stripMargin)
      .collect().map(r => r.getString(0) -> r).toMap
    texts.foreach { t =>
      val toks = t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
      val r = rows(t)
      assert(r.getLong(1) == TextStats.simHash(toks), s"simhash: $t")
      assert(r.getSeq[Long](2) == MinHash.signature(MinHash.shingles(toks)).toSeq, s"minhash: $t")
      assert(r.getSeq[String](3) ==
        MinHash.bandHashes(MinHash.signature(MinHash.shingles(toks))).toSeq, s"bands: $t")
      assert(r.getSeq[Long](4) == TextStats.winnow(t).toSeq, s"winnow: $t")
      assert(r.getLong(5) == TextStats.deflateLen(t), s"deflate: $t")
    }
    // band keys bucket near-dups together: a case-only variant shares all bands
    val b1 = spark.sql(
      "SELECT graft_minhash_bands('the quick brown fox jumps over the lazy dog') AS b")
      .collect().head.getSeq[String](0)
    val b2 = spark.sql(
      "SELECT graft_minhash_bands('The QUICK brown fox jumps over the lazy DOG') AS b")
      .collect().head.getSeq[String](0)
    assert(b1 == b2, "case-normalized variants must share every LSH band")
    spark.catalog.dropTempView("tsql")
  }
}

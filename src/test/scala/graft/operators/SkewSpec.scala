package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** [[Skew.saltedJoin]] — the one property that matters is OUTPUT EQUALITY
  * to the plain join (salting must be a pure physical rewrite), plus the
  * reason to use it at all: the hot key's rows actually scatter across
  * salts instead of funneling into one reducer.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  test("saltedJoin: equals plain join on a skewed key, hot rows scatter over all salts") {
    import spark.implicits._
    // 5000 rows on one hot key, a handful elsewhere — the shape salting exists for
    val large = ((1 to 5000).map(i => (i.toLong, "hot")) ++
      (1 to 7).map(i => (10000L + i, s"cold$i")))
      .toDF("row_id", "k")
    val small = (Seq("hot") ++ (1 to 7).map(i => s"cold$i")).zipWithIndex
      .map { case (k, i) => (k, 100L + i) }.toDF("dk", "attr")
    val salted = Skew.saltedJoin(large, small, "k", "dk", salts = 8, scatterCol = "row_id")
      .select($"row_id", $"k", $"attr")
    val plain = large.join(small, $"k" === $"dk").select($"row_id", $"k", $"attr")
    assert(salted.count() == 5007)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the scatter is real: the hot key's 5000 rows hash onto every salt
    val spread = large.filter($"k" === "hot")
      .select(pmod(hash($"row_id"), lit(8)).as("salt"))
      .distinct().count()
    assert(spread == 8, s"hot key only reached $spread of 8 salts")
    // deterministic: same inputs, same result (hash salt, no RNG)
    val again = Skew.saltedJoin(large.repartition(11), small, "k", "dk",
      salts = 8, scatterCol = "row_id").select($"row_id", $"k", $"attr")
    assert(again.exceptAll(salted).isEmpty && salted.exceptAll(again).isEmpty)
  }

  test("c4_chunk_dedup mega-key: one chunk in every doc stays exact (the shape the min_by agg exists for)") {
    import spark.implicits._
    // 2000 docs ALL sharing one 8-token boilerplate chunk + a unique
    // 2-token tail — the license-header skew that would funnel through a
    // single task under a fingerprint window; the associative min_by path
    // must stay exact and partition-invariant on it
    val hot = (0 until 8).map(i => s"h$i").mkString(" ")
    val docs = (0 until 2000).map { i =>
      (i.toLong, s"$hot u${i}a u${i}b", "en", s"src${i % 4}", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("chunk_skew").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run() = graft.Registry.queries("c4_chunk_dedup")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val rows = run()
    // every doc contributes 2 chunks (hot + tail); kept = all 2000 unique
    // tails + the hot chunk ONCE, attributed to doc 0's source (src0)
    assert(rows.map(_._3).sum == 4000L && rows.map(_._4).sum == 2001L)
    rows.foreach { case (src, nDocs, nChunks, nKept, tokTotal, tokKept, retained) =>
      assert(nDocs == 500 && nChunks == 1000)
      val expKept = if (src == "src0") 501L else 500L
      val expTokKept = if (src == "src0") 500L * 2 + 8 else 500L * 2
      assert(nKept == expKept, s"$src kept $nKept")
      assert(tokTotal == 500L * 10 && tokKept == expTokKept, s"$src tokens")
      assert(retained == expTokKept * 1000000 / tokTotal)
    }
    // partition invariance on the skewed fixture
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      assert(run().toSeq == rows.toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", orig)
  }
}

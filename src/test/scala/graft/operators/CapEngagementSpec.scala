package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{CapStats, SparkFixture, SparkEntry}

/** The engaged-cap gate, in-JVM half (VERDICT r14 → r15 directive #1).
  *
  * r14 added occupancy/df caps to every bucketed candidate join and
  * mirrored them into the DuckDB oracles — but at sf0.01 no fixture
  * bucket ever overflows a cap, so the DROPPING branch of each mirror
  * was dormant: never hash-checked, never even provably reached. This
  * spec plants a corpus dense enough that every cap-bearing registry
  * query drops candidates AT ITS DEFAULT CAP, then asserts via
  * [[CapStats]] that the no-silent-caps accounting actually fired (the
  * counter is recorded in the same code path as the WARN log line) and
  * that the query still returns sane output.
  *
  * The planted corpus, by block:
  *  - `dense` source: 520 identical docs — SimHash band buckets of 520
  *    (> LshBucketCap 512), every bigram/shingle at df 520 (> NgramDfCap
  *    256, > LshRecallDfCap 256), chunk fingerprints at df 520
  *    (> ChunkGraphDfCap 64).
  *  - `hub` source: 66 identical docs — bigram df 66 stays UNDER the
  *    ngram cap, so the pair mine emits the full K66 clique and every
  *    member carries Adamic-Adar degree 65 (> AaHubCap 64).
  *  - `mid` source: 10 identical docs — chunk df 10 keeps the k-core
  *    graph non-empty after the cap drops the dense/hub mega-chunks.
  *  - `path` source: a 3-doc token-overlap path A–B–C (A≁C), the
  *    non-edge that keeps c2_adamic_adar's output non-empty once the
  *    hub clique is capped away.
  *  - embeddings: 1600 vectors in ONE label whose first component
  *    dominates every hyperplane sum (all 1600 share one LSH bucket >
  *    cap; the label block and its vec_id%3 admissible subset both
  *    exceed the cap too).
  *
  * The out-of-JVM half — the same caps engaged via the SPARK_GRAFT_*_CAP
  * env knobs with the DuckDB oracles hash-matching at cpus 4 and 16 —
  * is run per-round and quoted in BENCH_NOTES.md (r15 section).
  */
class CapEngagementSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session

  /** Planted parquet dir matching the driver's documents/embeddings shape. */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cap_fixture").toString

    val denseText = (1 to 24).map(i => s"densetok$i").mkString(" ")
    val hubText = (1 to 24).map(i => s"hubtok$i").mkString(" ")
    val midText = (1 to 24).map(i => s"midtok$i").mkString(" ")
    def pathText(lo: Int, hi: Int) = (lo to hi).map(i => s"pathtok$i").mkString(" ")

    val docs =
      (1 to 520).map(i => (i.toLong, denseText, "en", "dense")) ++
      (1001 to 1066).map(i => (i.toLong, hubText, "en", "hub")) ++
      (2001 to 2010).map(i => (i.toLong, midText, "en", "mid")) ++
      Seq((3001L, pathText(1, 10), "en", "path"),
        (3002L, pathText(6, 15), "en", "path"),
        (3003L, pathText(11, 20), "en", "path"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // first component dominates (100 vs ±1e-3 noise), so every vector's
    // hyperplane signs equal plane(p, 0)'s sign — one LSH bucket of 1600
    val emb = (0 until 1600).map { i =>
      val v = Array.tabulate(64) { j =>
        if (j == 0) 100.0f else (((i * 31 + j * 7) % 11) - 5) * 1e-4f
      }
      (i.toLong, v, 0)
    }
    emb.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** registry key → CapStats tag of the cap it must engage */
  private val capBearing = Seq(
    "c2_simhash_pairs" -> "simhashPairs",
    "c2_ngram_jaccard" -> "c2_ngram_jaccard",
    "c2_containment" -> "c2_containment",
    "c2_lsh_recall" -> "c2_lsh_recall",
    "c2_kcore" -> "c2_kcore",
    "c2_adamic_adar" -> "c2_adamic_adar",
    "c2_edit_join" -> "c2_edit_join",
    "c3_ann_lsh" -> "annTopK",
    "c3_mmr" -> "mmrSelect",
    "c3_pq_search" -> "pqSearch",
    "c3_filtered_knn" -> "filteredKnn")

  test("every cap-bearing registry query drops candidates on the planted dense corpus " +
    "and records it (no-silent-caps)") {
    capBearing.foreach { case (key, tag) =>
      CapStats.clear()
      val rows =
        try SparkEntry.queries(key)(spark, plantedDir).count()
        finally { graft.CacheRegistry.releaseAll(); spark.catalog.clearCache() }
      val drop = CapStats.lastDrop(tag)
      assert(drop.nonEmpty,
        s"$key: cap '$tag' was never consulted (snapshot: ${CapStats.snapshot()})")
      assert(drop.exists(_ > 0),
        s"$key: cap '$tag' consulted but dropped 0 on the planted dense corpus")
      assert(rows > 0, s"$key: planted corpus produced an empty result")
    }
  }

  test("known drop arithmetic: the simhash head cap excludes exactly " +
    "bands*(bucket-520 minus head) rows") {
    CapStats.clear()
    try {
      TierCSim.simhashPairs(spark,
        graft.sources.Tables.documents(spark, plantedDir)
          .filter(col("source") === "dense"), 3).count()
      // 4 bands × one 520-doc bucket each, head keeps 512 → 4 × 8 = 32
      assert(CapStats.lastDrop("simhashPairs").contains(32L))
    } finally { graft.CacheRegistry.releaseAll(); spark.catalog.clearCache() }
  }

  test("capped ngram pairs are a strict subset of uncapped, jaccard never inflated") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, plantedDir)
      .filter($"source".isin("hub", "mid", "path"))
    try {
      val capped = TierCSim.ngramJaccardPairs(spark, docs, 0.08, dfCap = 4)
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(CapStats.lastDrop("c2_ngram_jaccard").exists(_ > 0),
        "dfCap=4 must drop the hub/mid grams (df 66 and 10)")
      val uncapped = TierCSim.ngramJaccardPairs(spark, docs, 0.08, dfCap = 1000000)
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(capped.keySet.subsetOf(uncapped.keySet),
        s"capped emitted pairs the uncapped mine lacks: ${capped.keySet.diff(uncapped.keySet)}")
      capped.foreach { case (k, j) =>
        assert(j <= uncapped(k) + 1e-12, s"pair $k: capped jaccard $j > uncapped ${uncapped(k)}")
      }
    } finally { graft.CacheRegistry.releaseAll(); spark.catalog.clearCache() }
  }
}

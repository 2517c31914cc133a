package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{CacheRegistry, QuerySpec}
import graft.functions.MinHash
import graft.sources.Tables

/** Tier C — LLM-training-data pipeline operators (SURVEY.md §2 C1–C5).
  *
  * Scale posture per operator:
  *  - c1: hash-aggregate on the dedup key — partial aggregation map-side,
  *    one shuffle, no row explosion.
  *  - c2: MinHash/LSH — signatures map-side, candidates only within LSH
  *    buckets (band self-join), never all-pairs.
  *  - c3: kNN blocked by `label` — the candidate join shuffles both sides
  *    on the block key; per-block work is |block|², never |corpus|².
  *  - c4/c5: explode→aggregate pipelines; token shuffles partial-aggregated.
  *
  * Determinism: cosine/tf-idf scores are computed with the exact same
  * left-associated double-arithmetic chain the oracle SQL uses; tf-idf is
  * additionally floored at 1e-6 resolution (floor and * are exact IEEE ops,
  * unlike half-up rounding whose implementations differ across engines).
  */
object TierC {

  // ------------------------------------------------------------------ C1
  private val c1 = QuerySpec(
    "c1_dedup_exact",
    "Exact dedup of documents by full text: canonical survivor = MIN(doc_id) per text (deterministic, unlike dropDuplicates' arbitrary pick), plus copy count and content hash.",
    Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, MD5(text) AS h
            FROM documents GROUP BY text ORDER BY keep_id"""),
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .groupBy($"text")
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select($"keep_id", $"n_copies", md5($"text").as("h"))
        .orderBy($"keep_id")
    }
  )

  // ------------------------------------------------------------------ C2
  private val bandsUdf = udf { (text: String) =>
    val toks = text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    MinHash.bandHashes(MinHash.signature(MinHash.shingles(toks)))
  }

  /** doc → (doc_id, band_id, band_hash) LSH index rows. The UDF runs in a
    * projection BEFORE the generator so it fires once per document, not
    * once per generated band row.
    */
  private[operators] def lshIndex(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // Par.spread: the signature UDF (per doc: ~|toks| md5 shingles × 32
    // linear-permutation slots) is the corpus-scan hot loop, and the
    // single-row-group sf tables scan as ONE task (guide §2.5 unsplittable
    // input). This is the one corpus-scan UDF heavy enough to pay for the
    // exchange: min-of-2 A/B at sf0.1 measured c2_dedup_near −0.35 s,
    // c2_dedup_pairs −0.31 s, c2_dedup_corpus −0.39 s, c2_band_occupancy
    // −0.23 s, c2_incremental −0.16 s with the spread ON (the cheap
    // bigram/msgpack/media-stub scans all measured a wash or a loss and
    // stay unspread — see OPTIMIZATION_r17.md).
    graft.Par.spread(docs).select($"doc_id", bandsUdf($"text").as("bands"))
      .select($"doc_id", posexplode($"bands").as(Seq("band_id", "band_hash")))
  }

  /** DuckDB replay of [[MinHash]] banding, shared by the `c2_dedup_near`
    * and `c2_dedup_pairs` oracles (converts both from declared-no-oracle
    * to hash-checked — the r10 verdict's top ask). The A_i/B_i tables are
    * spliced from the SAME Scala constants the engine uses (single source
    * of truth, the `dotChain` discipline); `% 2^64` over HUGEINT replays
    * the JVM Long wrap exactly (A_i < 2^62 bounds the product under
    * 2^122, see MinHash doc). `DISTINCT` on shingles is harmless — slot
    * minima ignore multiplicity.
    */
  private[operators] def mhBandCtes: String = {
    val m = BigInt(1) << 64
    val hexparse = (0 until 15).map(j =>
      s"(CAST(strpos('0123456789abcdef', substr(h, ${j + 1}, 1)) AS HUGEINT) - 1) * ${BigInt(16).pow(14 - j)}")
      .mkString(" + ")
    val acase = "CASE slot " + MinHash.A.zipWithIndex.map { case (a, i) =>
      s"WHEN $i THEN CAST($a AS HUGEINT)" }.mkString(" ") + " END"
    val bcase = "CASE slot " + MinHash.B.zipWithIndex.map { case (b, i) =>
      s"WHEN $i THEN CAST(${java.lang.Long.toUnsignedString(b)} AS HUGEINT)" }.mkString(" ") + " END"
    s"""d AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), s -> s <> '') AS toks
       |       FROM documents),
       |sh AS (SELECT doc_id, CASE WHEN len(toks) <= ${MinHash.ShingleSize}
       |         THEN [array_to_string(toks, ' ')]
       |         ELSE list_transform(range(1, len(toks) - 1),
       |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS shs
       |       FROM d),
       |shu AS (SELECT DISTINCT doc_id, unnest(shs) AS s FROM sh),
       |hx AS (SELECT doc_id, md5(s) AS h FROM shu),
       |base AS (SELECT doc_id, ($hexparse) AS b60 FROM hx),
       |slots AS (SELECT doc_id, unnest(range(0, ${MinHash.NumHashes})) AS slot, b60 FROM base),
       |v AS (SELECT doc_id, slot, (($acase) * b60 + ($bcase)) % $m AS vu FROM slots),
       |sig AS (SELECT doc_id, slot, MIN(vu) AS mv FROM v GROUP BY doc_id, slot),
       |band AS (SELECT doc_id, CAST(slot // ${MinHash.RowsPerBand} AS INTEGER) AS band_id,
       |           md5(string_agg(CAST(mv AS VARCHAR), '|' ORDER BY slot)) AS band_hash
       |         FROM sig GROUP BY doc_id, slot // ${MinHash.RowsPerBand})""".stripMargin
  }

  private val c2 = QuerySpec(
    "c2_dedup_near",
    "Near-dup MinHash/LSH signature index: 32 linear-permutation minhashes over md5-derived shingle bases → 8 bands → (doc_id, band_id, band_hash) bucket keys. Oracle replays the full chain (md5 → 15-hex-char HUGEINT parse → A·b+B mod 2^64 → unsigned slot minima → band md5) in DuckDB SQL.",
    Some(s"WITH $mhBandCtes\nSELECT doc_id, band_id, band_hash FROM band ORDER BY doc_id, band_id"),
    (s, d) => {
      import s.implicits._
      lshIndex(Tables.documents(s, d)).orderBy($"doc_id", $"band_id")
    }
  )

  private val c2pairs = QuerySpec(
    "c2_dedup_pairs",
    "Near-dup candidate pairs: LSH bucket self-join (band_id, band_hash) → distinct pairs → exact Jaccard verify ≥ 0.8 on distinct token sets. Empty when the corpus has no near-dups (sf0.01); non-empty at sf0.1. Oracle replays banding + bucket join + Jaccard end-to-end.",
    Some(s"""WITH $mhBandCtes,
            |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            |         FROM band a JOIN band b
            |           ON a.band_id = b.band_id AND a.band_hash = b.band_hash
            |              AND a.doc_id < b.doc_id),
            |tk AS (SELECT doc_id,
            |         list_distinct(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS toks
            |       FROM documents),
            |j AS (SELECT id_a, id_b,
            |        CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
            |          / CAST(len(list_distinct(list_concat(ta.toks, tb.toks))) AS DOUBLE) AS jaccard
            |      FROM cand
            |      JOIN tk ta ON ta.doc_id = cand.id_a
            |      JOIN tk tb ON tb.doc_id = cand.id_b)
            |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin),
    (s, d) => nearDuplicatePairs(s, Tables.documents(s, d), 0.8)
  )

  /** Full near-dup pipeline, reusable on any (doc_id, text) frame.
    *
    * Scale shape: signatures are map-side; candidates come only from LSH
    * bucket collisions (shuffle on the bucket key, well-distributed);
    * Jaccard verification touches candidate pairs only. The signature
    * index is persisted so the self-join's two sides don't recompute the
    * MinHash UDF over the corpus.
    *
    * COMPOSE WITH EXACT DEDUP FIRST: n exact copies of one document share
    * every band, so each of its buckets holds n members and the self-join
    * fans out O(n²) pairs that Jaccard-verify trivially — run c1
    * (min-id-per-text) before this and bucket sizes stay bounded by true
    * near-dup cluster sizes (pinned by a SimSpec test).
    */
  def nearDuplicatePairs(s: SparkSession, docs: DataFrame, threshold: Double): DataFrame = {
    import s.implicits._
    val idx = CacheRegistry.persist(lshIndex(docs))
    // self-join via explicit renames: df.as("x")/as("y") alias conditions on
    // a shared lineage can resolve both sides to the same attribute (a
    // trivially-true predicate ⇒ accidental all-pairs cross join)
    val left = idx.select($"doc_id".as("id_a"), $"band_id", $"band_hash")
    val right = idx.select($"doc_id".as("id_b"), $"band_id".as("band_id_r"), $"band_hash".as("band_hash_r"))
    val cand = left.join(right,
        $"band_id" === $"band_id_r" && $"band_hash" === $"band_hash_r" && $"id_a" < $"id_b")
      .select($"id_a", $"id_b")
      .distinct()
    val tokens = CacheRegistry.persist(docs.select($"doc_id",
      array_distinct(filter(split(lower($"text"), " "), t => t =!= "")).as("toks")))
    cand
      .join(tokens.withColumnRenamed("doc_id", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
      .join(tokens.withColumnRenamed("doc_id", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect($"toks_a", $"toks_b")).cast(DoubleType)
          / size(array_union($"toks_a", $"toks_b")).cast(DoubleType))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
      .orderBy($"id_a", $"id_b")
  }

  // ------------------------------------------------------------------ C3
  private def dotChain(l: String, r: String): String =
    (1 to 64).map(i => s"CAST($l.embedding[$i] AS DOUBLE)*CAST($r.embedding[$i] AS DOUBLE)")
      .mkString(" + ")

  /** Left-fold double dot product — bit-identical to the oracle's explicit
    * left-associated 64-term sum (IEEE adds in the same order). Implemented
    * as a native codegen Expression ([[graft.functions.DotProductFloat]]):
    * round-2/3 benching showed first zip_with+aggregate (interpreted HOF
    * fold) and then a Scala UDF (Seq[Float] boxing) each dominating the
    * whole kNN query; the expression fuses into the join's generated loop.
    */
  private[operators] def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotF(a, b)

  private val c3 = QuerySpec(
    "c3_knn_cosine",
    "Similarity search: exact cosine top-3 neighbors per vector within its `label` block (LSH-style blocking keeps the pair count |block|² — never a full cross join).",
    Some(s"""WITH p AS (
              SELECT a.vec_id AS ida, b.vec_id AS idb,
                     (${dotChain("a", "b")}) AS dot,
                     (${dotChain("a", "a")}) AS na2,
                     (${dotChain("b", "b")}) AS nb2
              FROM embeddings a
              JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id),
            sc AS (SELECT ida, idb, dot / (sqrt(na2) * sqrt(nb2)) AS score FROM p),
            r AS (SELECT ida, idb, score,
                    ROW_NUMBER() OVER (PARTITION BY ida ORDER BY score DESC, idb) AS rn
                  FROM sc)
            SELECT ida, idb, score, rn FROM r WHERE rn <= 3 ORDER BY ida, rn"""),
    (s, d) => {
      import s.implicits._
      // norms once per VECTOR, persisted: without the materialization,
      // CollapseProject inlines the norm computation back into the join
      // output and it re-runs per PAIR (measured 2-3x the query cost)
      val e = CacheRegistry.persist(Tables.embeddings(s, d)
        .select($"vec_id", $"label", $"embedding",
          dot($"embedding", $"embedding").as("n2")))
      val a = e.select($"vec_id".as("ida"), $"label", $"embedding".as("ea"), $"n2".as("na2"))
      val b = e.select($"vec_id".as("idb"), $"label".as("label_b"), $"embedding".as("eb"), $"n2".as("nb2"))
      val w = Window.partitionBy($"ida").orderBy($"score".desc, $"idb")
      a.join(b, $"label" === $"label_b" && $"ida" =!= $"idb")
        .withColumn("score", dot($"ea", $"eb") / (sqrt($"na2") * sqrt($"nb2")))
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter($"rn" <= 3)
        .select($"ida", $"idb", $"score", $"rn")
        .orderBy($"ida", $"rn")
    }
  )

  // ------------------------------------------------------------------ C4
  private val c4 = QuerySpec(
    "c4_text_tf",
    "Text analysis: tokenize (explode), normalize case, term frequency per language.",
    Some("""SELECT lang, token, COUNT(*) AS tf FROM (
              SELECT lang, unnest(string_split(lower(text), ' ')) AS token FROM documents) t
            WHERE token <> '' GROUP BY lang, token ORDER BY lang, token"""),
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"lang", explode(split(lower($"text"), " ")).as("token"))
        .filter($"token" =!= "")
        .groupBy($"lang", $"token").agg(count(lit(1)).as("tf"))
        .orderBy($"lang", $"token")
    }
  )

  // ------------------------------------------------------------------ C5
  private val c5 = QuerySpec(
    "c5_tfidf",
    "TF-IDF top-5 terms per source: tf per (source, token) × ln(N/df), scored at fixed 1e-6 resolution via exact floor (cross-engine-stable, unlike round).",
    Some("""WITH toks AS (
              SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS token FROM documents),
            t2 AS (SELECT * FROM toks WHERE token <> ''),
            tf AS (SELECT source, token, COUNT(*) AS tf FROM t2 GROUP BY source, token),
            df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM t2 GROUP BY token),
            n AS (SELECT COUNT(*) AS n FROM documents),
            sc AS (SELECT tf.source, tf.token, tf.tf,
                     CAST(FLOOR(tf.tf * LN(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)) * 1000000) AS BIGINT) AS score_e6
                   FROM tf JOIN df ON tf.token = df.token CROSS JOIN n),
            r AS (SELECT source, token, tf, score_e6,
                    ROW_NUMBER() OVER (PARTITION BY source ORDER BY score_e6 DESC, token) AS rn
                  FROM sc)
            SELECT source, token, tf, score_e6, rn FROM r WHERE rn <= 5 ORDER BY source, rn"""),
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      // persisted: the token explosion feeds both the tf and df branches —
      // without the barrier each branch re-scans and re-explodes the corpus
      val toks = CacheRegistry.persist(docs
        .select($"doc_id", $"source", explode(split(lower($"text"), " ")).as("token"))
        .filter($"token" =!= ""))
      val tf = toks.groupBy($"source", $"token").agg(count(lit(1)).as("tf"))
      val df = toks.groupBy($"token").agg(countDistinct($"doc_id").as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"source").orderBy($"score_e6".desc, $"token")
      tf.join(df, "token")
        .crossJoin(broadcast(n))
        .withColumn("score_e6",
          floor($"tf" * log($"n".cast(DoubleType) / $"df".cast(DoubleType)) * 1000000).cast(LongType))
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter($"rn" <= 5)
        .select($"source", $"token", $"tf", $"score_e6", $"rn")
        .orderBy($"source", $"rn")
    }
  )

  // ----------------------------------------------------------------- C5b
  /** Okapi BM25 retrieval scoring for a fixed 3-term query (k1=1.2,
    * b=0.75). The Spark expression and the oracle SQL are generated from
    * the SAME term list with identical parenthesization, and the per-term
    * contributions are PIVOTED into columns summed in fixed left-assoc
    * order — a per-(doc,term) SUM would make float addition order
    * partition-dependent. Shape: one token explosion feeding a per-doc
    * conditional aggregate plus one broadcast global-stats row; scoring is
    * then map-side, top-10 via TakeOrdered. idf's ln is floor-quantized at
    * 1e-6 only after the full sum (the c5 discipline).
    */
  private val Bm25Terms = Seq("spark", "table", "query")
  private val c5b = QuerySpec(
    "c5b_bm25",
    "BM25 top-10 docs for the fixed query {spark, table, query}: exact integer tf/df/len stats, replayed IEEE scoring chain, floor-1e-6 quantized.",
    Some {
      val tfs = Bm25Terms.zipWithIndex.map { case (t, i) =>
        s"CAST(COUNT(CASE WHEN token='$t' THEN 1 END) AS BIGINT) AS tf${i + 1}"
      }.mkString(",\n                ")
      val dfs = Bm25Terms.zipWithIndex.map { case (t, i) =>
        s"CAST(COUNT(DISTINCT CASE WHEN token='$t' THEN doc_id END) AS BIGINT) AS df${i + 1}"
      }.mkString(",\n                ")
      val terms = Bm25Terms.indices.map { i =>
        val (tf, df) = (s"d.tf${i + 1}", s"g.df${i + 1}")
        s"""ln((CAST(g.n AS DOUBLE) - CAST($df AS DOUBLE) + 0.5)/(CAST($df AS DOUBLE) + 0.5) + 1.0)
              * (CAST($tf AS DOUBLE) * 2.2)
              / (CAST($tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(d.len AS DOUBLE) / (CAST(g.total_toks AS DOUBLE) / CAST(g.n AS DOUBLE))))"""
      }.mkString("\n            + ")
      s"""WITH t2 AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
            t AS (SELECT * FROM t2 WHERE token <> ''),
            d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len,
                $tfs
              FROM t GROUP BY doc_id),
            g AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n,
                CAST(COUNT(*) AS BIGINT) AS total_toks,
                $dfs
              FROM t),
            s AS (SELECT d.doc_id, $terms AS score FROM d CROSS JOIN g),
            r AS (SELECT doc_id, CAST(floor(score*1000000) AS BIGINT) AS score_e6,
                row_number() OVER (ORDER BY CAST(floor(score*1000000) AS BIGINT) DESC, doc_id) AS rn
              FROM s)
            SELECT doc_id, score_e6, rn FROM r WHERE rn <= 10 ORDER BY rn"""
    },
    (s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
        .filter($"token" =!= "")
      val perDoc = toks.groupBy($"doc_id").agg(
        count(lit(1)).as("len"),
        Bm25Terms.zipWithIndex.map { case (t, i) =>
          count(when($"token" === t, 1)).as(s"tf${i + 1}")
        }: _*)
      // Global stats fold the per-doc aggregate instead of re-scanning token
      // rows: n = docs with tokens, total_toks = Σ len, df_i = docs with
      // tf_i > 0 — exact-integer equivalent to the token-level distincts, no
      // token-row persist to leak, and the two perDoc consumers share one
      // exchange (ReuseExchange) rather than a cached explosion.
      val global = perDoc.agg(
        count(lit(1)).as("n"),
        (Seq(sum($"len").as("total_toks")) ++
          Bm25Terms.indices.map { i =>
            count(when(col(s"tf${i + 1}") > 0, 1)).as(s"df${i + 1}")
          }): _*)
      val dbl = (c: Column) => c.cast(DoubleType)
      val score = Bm25Terms.indices.map { i =>
        val tf = dbl(col(s"tf${i + 1}"))
        val df = dbl(col(s"df${i + 1}"))
        val idf = log((dbl($"n") - df + 0.5) / (df + 0.5) + 1.0)
        idf * (tf * 2.2) /
          (tf + lit(1.2) * (lit(0.25) + lit(0.75) * dbl($"len") / (dbl($"total_toks") / dbl($"n"))))
      }.reduceLeft(_ + _)
      // top-10 via orderBy+limit (TakeOrderedAndProject: per-partition
      // top-k + k-merge), NOT a row_number window over the full score
      // frame — that window was the engine's ONE unpartitioned window,
      // funneling |docs| rows through a single task at scale. The rank
      // window that remains runs over the 10 surviving rows only.
      perDoc.crossJoin(broadcast(global))
        .select($"doc_id", floor(score * 1000000).cast(LongType).as("score_e6"))
        .orderBy($"score_e6".desc, $"doc_id")
        .limit(10)
        .withColumn("rn",
          row_number().over(Window.orderBy($"score_e6".desc, $"doc_id")).cast(LongType))
        .orderBy($"rn")
    }
  )

  // ------------------------------------------------- two-stage re-rank
  /** Coarse-then-exact retrieval — the production ANN serving shape this
    * tier otherwise lacks: stage 1 scores candidate pairs by the FIRST
    * [[RerankPrefix]] dims only (a Matryoshka-style prefix cosine) and
    * keeps the top-[[RerankCoarseK]] per query; stage 2 re-fetches the
    * full vectors BY ID for the survivors and re-ranks by exact
    * 64-dim cosine.
    *
    * Scale shape: the candidate fan-out carries a 16-float prefix, not
    * the full vector (4× less pair payload; at production dims — 1536+
    * with a 64-dim prefix — 24×), and the expensive exact scoring runs
    * on |queries|·C survivor rows instead of every candidate pair. The
    * two survivor joins are id-equi-joins Spark shuffles on vec_id. Both
    * stages' arithmetic is the replayable left-fold chain, so the oracle
    * hash-checks end-to-end (coarse cut ties break by id; equal doubles
    * on both engines ⇒ same survivor set).
    */
  private val RerankPrefix = 16
  private val RerankCoarseK = 10
  private def dotChainN(l: String, r: String, n: Int): String =
    (1 to n).map(i => s"CAST($l.embedding[$i] AS DOUBLE)*CAST($r.embedding[$i] AS DOUBLE)")
      .mkString(" + ")
  private val c3r = QuerySpec(
    "c3_rerank",
    s"Two-stage retrieval: coarse top-$RerankCoarseK per query by $RerankPrefix-dim prefix cosine within the label block (pairs carry the prefix only), exact 64-dim cosine re-rank to top-3 after re-fetching full vectors by id.",
    Some(s"""WITH p AS (
              SELECT a.vec_id AS ida, b.vec_id AS idb,
                     (${dotChainN("a", "b", RerankPrefix)}) AS dot16,
                     (${dotChainN("a", "a", RerankPrefix)}) AS na16,
                     (${dotChainN("b", "b", RerankPrefix)}) AS nb16
              FROM embeddings a
              JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id),
            sc AS (SELECT ida, idb, dot16 / (sqrt(na16) * sqrt(nb16)) AS coarse FROM p),
            cr AS (SELECT ida, idb, coarse,
                    ROW_NUMBER() OVER (PARTITION BY ida ORDER BY coarse DESC, idb) AS crn
                   FROM sc),
            surv AS (SELECT ida, idb FROM cr WHERE crn <= $RerankCoarseK),
            ex AS (SELECT surv.ida, surv.idb,
                     (${dotChainN("qa", "qb", 64)}) AS dot,
                     (${dotChainN("qa", "qa", 64)}) AS na2,
                     (${dotChainN("qb", "qb", 64)}) AS nb2
                   FROM surv
                   JOIN embeddings qa ON qa.vec_id = surv.ida
                   JOIN embeddings qb ON qb.vec_id = surv.idb),
            fin AS (SELECT ida, idb, dot / (sqrt(na2) * sqrt(nb2)) AS score FROM ex),
            r AS (SELECT ida, idb, score,
                    ROW_NUMBER() OVER (PARTITION BY ida ORDER BY score DESC, idb) AS rn
                  FROM fin)
            SELECT ida, idb, score, rn FROM r WHERE rn <= 3 ORDER BY ida, rn"""),
    (s, d) => {
      import s.implicits._
      // prefix projection persisted: it feeds both sides of the coarse
      // join (the CollapseProject re-run hazard), and the pair shuffle
      // carries ONLY (id, label, 16 floats, norm)
      val emb = Tables.embeddings(s, d)
      val pre = CacheRegistry.persist(emb
        .select($"vec_id", $"label", slice($"embedding", 1, RerankPrefix).as("p16"))
        .withColumn("n16", dot($"p16", $"p16")))
      val a = pre.select($"vec_id".as("ida"), $"label", $"p16".as("pa"), $"n16".as("na16"))
      val b = pre.select($"vec_id".as("idb"), $"label".as("label_b"), $"p16".as("pb"), $"n16".as("nb16"))
      val cw = Window.partitionBy($"ida").orderBy($"coarse".desc, $"idb")
      val surv = a.join(b, $"label" === $"label_b" && $"ida" =!= $"idb")
        .withColumn("coarse", dot($"pa", $"pb") / (sqrt($"na16") * sqrt($"nb16")))
        .withColumn("crn", row_number().over(cw))
        .filter($"crn" <= RerankCoarseK)
        .select($"ida", $"idb")
      // full vectors re-fetched by id for survivors only
      val full = CacheRegistry.persist(emb
        .select($"vec_id", $"embedding", dot($"embedding", $"embedding").as("n2")))
      val w = Window.partitionBy($"ida").orderBy($"score".desc, $"idb")
      surv
        .join(full.select($"vec_id".as("ida"), $"embedding".as("ea"), $"n2".as("na2")), Seq("ida"))
        .join(full.select($"vec_id".as("idb"), $"embedding".as("eb"), $"n2".as("nb2")), Seq("idb"))
        .withColumn("score", dot($"ea", $"eb") / (sqrt($"na2") * sqrt($"nb2")))
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter($"rn" <= 3)
        .select($"ida", $"idb", $"score", $"rn")
        .orderBy($"ida", $"rn")
    }
  )

  // ---------------------------------------------------------- C5c (QL)
  /** Query-likelihood retrieval with Dirichlet smoothing — the language-
    * modeling scorer that completes the lexical-retrieval family next to
    * TF-IDF ([[c5]]) and BM25 ([[c5b]]): score(q,d) = Σ_t ln((tf_td +
    * µ·p_t) / (len_d + µ)) with the corpus unigram LM p_t = cf_t/|C| and
    * µ = 256 (a binary fraction, so µ·p_t is one multiply + one divide —
    * the shortest replayable chain). Zhai & Lafferty's standard form.
    *
    * Scale shape — identical to the audited BM25 plan: per-doc tf/len in
    * ONE partial-agged aggregate, global stats FOLD that aggregate
    * (cf_t = Σ tf_td, so the token rows are never re-scanned and the two
    * consumers share one exchange), the one-row global frame broadcasts,
    * and the top-10 is TakeOrderedAndProject — the rank window runs over
    * the 10 survivors only.
    */
  private val QlMu = 256.0
  private val c5c = QuerySpec(
    "c5c_ql_dirichlet",
    "Query-likelihood retrieval (Dirichlet smoothing, mu=256) for the fixed query {spark, table, query}: corpus-LM-smoothed per-doc log-likelihood, exact integer stats, replayed IEEE ln chain, floor-1e-6 quantized top-10.",
    Some {
      val tfs = Bm25Terms.zipWithIndex.map { case (t, i) =>
        s"CAST(COUNT(CASE WHEN token='$t' THEN 1 END) AS BIGINT) AS tf${i + 1}"
      }.mkString(",\n                ")
      val cfs = Bm25Terms.indices.map { i =>
        s"CAST(SUM(tf${i + 1}) AS BIGINT) AS cf${i + 1}"
      }.mkString(",\n                ")
      val terms = Bm25Terms.indices.map { i =>
        s"""ln((CAST(d.tf${i + 1} AS DOUBLE) + 256.0 * (CAST(g.cf${i + 1} AS DOUBLE) / CAST(g.total_toks AS DOUBLE)))
              / (CAST(d.len AS DOUBLE) + 256.0))"""
      }.mkString("\n            + ")
      s"""WITH t2 AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
            t AS (SELECT * FROM t2 WHERE token <> ''),
            d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len,
                $tfs
              FROM t GROUP BY doc_id),
            g AS (SELECT CAST(SUM(len) AS BIGINT) AS total_toks,
                $cfs
              FROM d),
            s AS (SELECT d.doc_id, $terms AS score FROM d CROSS JOIN g),
            r AS (SELECT doc_id, CAST(floor(score*1000000) AS BIGINT) AS score_e6,
                row_number() OVER (ORDER BY CAST(floor(score*1000000) AS BIGINT) DESC, doc_id) AS rn
              FROM s)
            SELECT doc_id, score_e6, rn FROM r WHERE rn <= 10 ORDER BY rn"""
    },
    (s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
        .filter($"token" =!= "")
      val perDoc = toks.groupBy($"doc_id").agg(
        count(lit(1)).as("len"),
        Bm25Terms.zipWithIndex.map { case (t, i) =>
          count(when($"token" === t, 1)).as(s"tf${i + 1}")
        }: _*)
      val global = perDoc.agg(
        sum($"len").as("total_toks"),
        Bm25Terms.indices.map { i =>
          sum(col(s"tf${i + 1}")).as(s"cf${i + 1}")
        }: _*)
      val dbl = (c: Column) => c.cast(DoubleType)
      val score = Bm25Terms.indices.map { i =>
        log((dbl(col(s"tf${i + 1}")) + lit(QlMu) * (dbl(col(s"cf${i + 1}")) / dbl($"total_toks")))
          / (dbl($"len") + lit(QlMu)))
      }.reduceLeft(_ + _)
      perDoc.crossJoin(broadcast(global))
        .select($"doc_id", floor(score * 1000000).cast(LongType).as("score_e6"))
        .orderBy($"score_e6".desc, $"doc_id")
        .limit(10)
        .withColumn("rn",
          row_number().over(Window.orderBy($"score_e6".desc, $"doc_id")).cast(LongType))
        .orderBy($"rn")
    }
  )

  // ------------------------------------- hubness census (c3_hubness)
  /** k-occurrence (hubness) census — THE high-dimensional ANN pathology
    * check: how often does each vector appear in other vectors' top-3
    * lists? A heavy hub tail means a few points dominate every neighbor
    * list (distances concentrating), which silently poisons kNN-graph
    * dedup and retrieval; the census is read next to [[c3]]'s own top-3.
    * Anti-hubs (k-occurrence 0) are counted via the right join back to
    * the full vector set.
    *
    * Scale shape: the [[c3]] label-blocked pair join (never all-pairs),
    * WindowGroupLimit top-3, then two partial-agg rollups — the neighbor
    * count and the bounded occurrence histogram.
    */
  private val c3hb = QuerySpec(
    "c3_hubness",
    "ANN hubness census: k-occurrence histogram of the within-label cosine top-3 graph (how many vectors appear in 0, 1, 2, ... neighbor lists) — the distance-concentration pathology check; label-blocked join + WindowGroupLimit + two partial-agg rollups.",
    Some(s"""WITH p AS (
              SELECT a.vec_id AS ida, b.vec_id AS idb,
                     (${dotChain("a", "b")}) AS dot,
                     (${dotChain("a", "a")}) AS na2,
                     (${dotChain("b", "b")}) AS nb2
              FROM embeddings a
              JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id),
            sc AS (SELECT ida, idb, dot / (sqrt(na2) * sqrt(nb2)) AS score FROM p),
            r AS (SELECT ida, idb,
                    ROW_NUMBER() OVER (PARTITION BY ida ORDER BY score DESC, idb) AS rn
                  FROM sc),
            k AS (SELECT idb, CAST(COUNT(*) AS BIGINT) AS kocc FROM r WHERE rn <= 3 GROUP BY idb),
            h AS (SELECT COALESCE(k.kocc, 0) AS kocc
                  FROM embeddings e LEFT JOIN k ON k.idb = e.vec_id)
            SELECT CAST(kocc AS BIGINT) AS kocc, COUNT(*) AS n
            FROM h GROUP BY kocc ORDER BY kocc"""),
    (s, d) => {
      import s.implicits._
      val e = CacheRegistry.persist(Tables.embeddings(s, d)
        .select($"vec_id", $"label", $"embedding",
          dot($"embedding", $"embedding").as("n2")))
      val a = e.select($"vec_id".as("ida"), $"label", $"embedding".as("ea"), $"n2".as("na2"))
      val b = e.select($"vec_id".as("idb"), $"label".as("label_b"), $"embedding".as("eb"), $"n2".as("nb2"))
      val w = Window.partitionBy($"ida").orderBy($"score".desc, $"idb")
      val k = a.join(b, $"label" === $"label_b" && $"ida" =!= $"idb")
        .withColumn("score", dot($"ea", $"eb") / (sqrt($"na2") * sqrt($"nb2")))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .groupBy($"idb").agg(count(lit(1)).as("kocc"))
      e.select($"vec_id").join(k, $"vec_id" === $"idb", "left")
        .select(coalesce($"kocc", lit(0L)).cast(LongType).as("kocc"))
        .groupBy($"kocc").agg(count(lit(1)).as("n"))
        .orderBy($"kocc")
    }
  )

  // ------------------------------ reciprocal-rank fusion (c5d_rrf)
  /** Reciprocal-rank fusion of the [[c5b]] BM25 and [[c5c]] QL-Dirichlet
    * top-10 lists — the standard hybrid-retrieval merge (Cormack et al.'s
    * RRF, k=60): each retrieved list contributes `1/(60+rank)`; documents
    * retrieved by both rankers float to the top. Contributions are exact
    * integer divisions `1e6 div (60+rank)`, so the fused ordering is
    * bit-deterministic; absent ranks contribute 0 (the top-k-lists form
    * of RRF — exactly what a serving stack fuses).
    *
    * Scale shape: ONE shared per-doc tf aggregate feeds BOTH scoring
    * chains (the expensive token pass is paid once); each top-10 is
    * TakeOrdered (never a global sort); the fusion is a full-outer join
    * of two ≤10-row frames. The scored frame is cached so the two
    * TakeOrdered consumers don't recompute the cross-joined chains.
    */
  private val RrfK = 60
  private val c5d = QuerySpec(
    "c5d_rrf",
    s"Reciprocal-rank fusion (k=$RrfK) of the BM25 and QL-Dirichlet top-10 lists for the fixed query {spark, table, query}: exact integer 1e6 div ($RrfK+rank) contributions, full-outer merge of the two TakeOrdered lists; one shared per-doc tf aggregate feeds both scoring chains.",
    Some {
      val tfs = Bm25Terms.zipWithIndex.map { case (t, i) =>
        s"CAST(COUNT(CASE WHEN token='$t' THEN 1 END) AS BIGINT) AS tf${i + 1}"
      }.mkString(",\n                ")
      val gexprs = (Bm25Terms.indices.map { i =>
        s"CAST(COUNT(CASE WHEN tf${i + 1} > 0 THEN 1 END) AS BIGINT) AS df${i + 1}"
      } ++ Bm25Terms.indices.map { i =>
        s"CAST(SUM(tf${i + 1}) AS BIGINT) AS cf${i + 1}"
      }).mkString(",\n                ")
      val bmTerms = Bm25Terms.indices.map { i =>
        val (tf, df) = (s"d.tf${i + 1}", s"g.df${i + 1}")
        s"""ln((CAST(g.n AS DOUBLE) - CAST($df AS DOUBLE) + 0.5)/(CAST($df AS DOUBLE) + 0.5) + 1.0)
              * (CAST($tf AS DOUBLE) * 2.2)
              / (CAST($tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(d.len AS DOUBLE) / (CAST(g.total_toks AS DOUBLE) / CAST(g.n AS DOUBLE))))"""
      }.mkString("\n            + ")
      val qlTerms = Bm25Terms.indices.map { i =>
        s"""ln((CAST(d.tf${i + 1} AS DOUBLE) + $QlMu * (CAST(g.cf${i + 1} AS DOUBLE) / CAST(g.total_toks AS DOUBLE)))
              / (CAST(d.len AS DOUBLE) + $QlMu))"""
      }.mkString("\n            + ")
      s"""WITH t2 AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents),
            t AS (SELECT * FROM t2 WHERE token <> ''),
            d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len,
                $tfs
              FROM t GROUP BY doc_id),
            g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(len) AS BIGINT) AS total_toks,
                $gexprs
              FROM d),
            sc AS (SELECT d.doc_id,
                CAST(floor(($bmTerms) * 1000000) AS BIGINT) AS bm_e6,
                CAST(floor(($qlTerms) * 1000000) AS BIGINT) AS ql_e6
              FROM d CROSS JOIN g),
            rb AS (SELECT doc_id, row_number() OVER (ORDER BY bm_e6 DESC, doc_id) AS rn FROM sc),
            tb AS (SELECT * FROM rb WHERE rn <= 10),
            rq AS (SELECT doc_id, row_number() OVER (ORDER BY ql_e6 DESC, doc_id) AS rn FROM sc),
            tq AS (SELECT * FROM rq WHERE rn <= 10)
            SELECT COALESCE(tb.doc_id, tq.doc_id) AS doc_id,
              CAST(COALESCE(tb.rn, 0) AS BIGINT) AS rn_bm25,
              CAST(COALESCE(tq.rn, 0) AS BIGINT) AS rn_ql,
              CAST((CASE WHEN tb.rn IS NULL THEN 0 ELSE 1000000 // ($RrfK + tb.rn) END)
                 + (CASE WHEN tq.rn IS NULL THEN 0 ELSE 1000000 // ($RrfK + tq.rn) END) AS BIGINT) AS rrf_e6
            FROM tb FULL OUTER JOIN tq ON tq.doc_id = tb.doc_id
            ORDER BY rrf_e6 DESC, doc_id"""
    },
    (s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
        .filter($"token" =!= "")
      val perDoc = toks.groupBy($"doc_id").agg(
        count(lit(1)).as("len"),
        Bm25Terms.zipWithIndex.map { case (t, i) =>
          count(when($"token" === t, 1)).as(s"tf${i + 1}")
        }: _*)
      val global = perDoc.agg(
        count(lit(1)).as("n"),
        (Seq(sum($"len").as("total_toks")) ++
          Bm25Terms.indices.map { i =>
            count(when(col(s"tf${i + 1}") > 0, 1)).as(s"df${i + 1}")
          } ++ Bm25Terms.indices.map { i =>
            sum(col(s"tf${i + 1}")).as(s"cf${i + 1}")
          }): _*)
      val dbl = (c: Column) => c.cast(DoubleType)
      val bmScore = Bm25Terms.indices.map { i =>
        val tf = dbl(col(s"tf${i + 1}"))
        val df = dbl(col(s"df${i + 1}"))
        val idf = log((dbl($"n") - df + 0.5) / (df + 0.5) + 1.0)
        idf * (tf * 2.2) /
          (tf + lit(1.2) * (lit(0.25) + lit(0.75) * dbl($"len") / (dbl($"total_toks") / dbl($"n"))))
      }.reduceLeft(_ + _)
      val qlScore = Bm25Terms.indices.map { i =>
        log((dbl(col(s"tf${i + 1}")) + lit(QlMu) * (dbl(col(s"cf${i + 1}")) / dbl($"total_toks")))
          / (dbl($"len") + lit(QlMu)))
      }.reduceLeft(_ + _)
      val scored = CacheRegistry.persist(
        perDoc.crossJoin(broadcast(global))
          .select($"doc_id",
            floor(bmScore * 1000000).cast(LongType).as("bm_e6"),
            floor(qlScore * 1000000).cast(LongType).as("ql_e6")))
      def topTen(scoreCol: String, rnName: String) =
        scored.orderBy(col(scoreCol).desc, $"doc_id").limit(10)
          .withColumn(rnName,
            row_number().over(Window.orderBy(col(scoreCol).desc, $"doc_id")).cast(LongType))
          .select($"doc_id", col(rnName))
      val tb = topTen("bm_e6", "rn_bm25").withColumnRenamed("doc_id", "id_b")
      val tq = topTen("ql_e6", "rn_ql").withColumnRenamed("doc_id", "id_q")
      tb.join(tq, $"id_b" === $"id_q", "fullouter")
        .select(coalesce($"id_b", $"id_q").as("doc_id"),
          coalesce($"rn_bm25", lit(0L)).as("rn_bm25"),
          coalesce($"rn_ql", lit(0L)).as("rn_ql"),
          (when($"rn_bm25".isNull, 0L)
              .otherwise(expr(s"1000000 div ($RrfK + rn_bm25)")) +
            when($"rn_ql".isNull, 0L)
              .otherwise(expr(s"1000000 div ($RrfK + rn_ql)"))).cast(LongType).as("rrf_e6"))
        .orderBy($"rrf_e6".desc, $"doc_id")
    }
  )

  // --------------------------------- MinHash estimator calibration (c2me)
  /** MinHash estimate-vs-exact calibration census — the third leg of the
    * dedup tuning suite (threshold choice = `c2_jaccard_hist`, banding
    * recall = `c2_lsh_recall`, and now SIGNATURE SIZE): over a bounded,
    * deterministic pair sample (each doc paired with its next 2 doc_id
    * successors within its source — a source-partitioned lead window, so
    * the sample is ~2N pairs on any corpus, never a block²), count the
    * matching signature slots (the 32-hash estimator: Ĵ = matches/32) and
    * compute the EXACT Jaccard over the same distinct trigram shingles the
    * signature hashes. Grouped by match count, the result is the
    * calibration curve: if the exact-Jaccard spread within a match bucket
    * is wide, 32 hashes are too few for the corpus's similarity regime.
    * All ratios are exact integer e6 divisions; the estimate grid is
    * matches·1e6 div 32.
    *
    * Scale shape: signatures + distinct shingle sets computed once per doc
    * (cached), pairs via a source-partitioned window (no self-join), two
    * co-keyed probe joins back to the cache, bounded ≤33-bucket census.
    */
  private val sigShUdf = udf { (text: String) =>
    val toks = text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    val sh = MinHash.shingles(toks).distinct
    (MinHash.signature(sh), sh.toArray)
  }
  private val c2me = QuerySpec(
    "c2_minhash_err",
    "MinHash signature-size calibration: per deterministic within-source successor pair, matching-slot count (estimate grid matches*1e6 div 32) vs exact shingle Jaccard (integer e6), censused by match count with n/sum/min/max of the exact values.",
    Some(s"""WITH $mhBandCtes,
            |pr0 AS (SELECT source, doc_id AS ida,
            |         lead(doc_id, 1) OVER w AS b1, lead(doc_id, 2) OVER w AS b2
            |       FROM documents WINDOW w AS (PARTITION BY source ORDER BY doc_id)),
            |pr AS (SELECT ida, b1 AS idb FROM pr0 WHERE b1 IS NOT NULL
            |       UNION ALL SELECT ida, b2 AS idb FROM pr0 WHERE b2 IS NOT NULL),
            |m AS (SELECT pr.ida, pr.idb,
            |        CAST(COUNT(CASE WHEN sa.mv = sb.mv THEN 1 END) AS BIGINT) AS matches
            |      FROM pr JOIN sig sa ON sa.doc_id = pr.ida
            |              JOIN sig sb ON sb.doc_id = pr.idb AND sb.slot = sa.slot
            |      GROUP BY pr.ida, pr.idb),
            |scnt AS (SELECT doc_id, COUNT(*) AS ns FROM shu GROUP BY doc_id),
            |it AS (SELECT pr.ida, pr.idb, CAST(COUNT(*) AS BIGINT) AS inter
            |       FROM pr JOIN shu a ON a.doc_id = pr.ida
            |               JOIN shu b ON b.doc_id = pr.idb AND b.s = a.s
            |       GROUP BY pr.ida, pr.idb),
            |ex AS (SELECT m.matches,
            |         (COALESCE(it.inter, 0) * 1000000)
            |           // (ca.ns + cb.ns - COALESCE(it.inter, 0)) AS exact_e6
            |       FROM m LEFT JOIN it ON it.ida = m.ida AND it.idb = m.idb
            |              JOIN scnt ca ON ca.doc_id = m.ida
            |              JOIN scnt cb ON cb.doc_id = m.idb)
            |SELECT matches, CAST((matches * 1000000) // 32 AS BIGINT) AS est_e6,
            |  COUNT(*) AS n_pairs,
            |  CAST(SUM(exact_e6) AS BIGINT) AS sum_exact_e6,
            |  CAST(MIN(exact_e6) AS BIGINT) AS min_exact_e6,
            |  CAST(MAX(exact_e6) AS BIGINT) AS max_exact_e6
            |FROM ex GROUP BY matches ORDER BY matches""".stripMargin),
    (s, d) => {
      import s.implicits._
      val base = graft.CacheRegistry.persist(Tables.documents(s, d)
        .select($"doc_id", $"source", sigShUdf($"text").as("ss"))
        .select($"doc_id", $"source", $"ss._1".as("sig"), $"ss._2".as("shs")))
      val w = Window.partitionBy($"source").orderBy($"doc_id")
      val pr = base
        .select($"doc_id".as("ida"),
          lead($"doc_id", 1).over(w).as("b1"), lead($"doc_id", 2).over(w).as("b2"))
        .select($"ida", explode(array($"b1", $"b2")).as("idb"))
        .filter($"idb".isNotNull)
      val j = pr
        .join(base.select($"doc_id".as("ida"), $"sig".as("siga"), $"shs".as("sha")), "ida")
        .join(base.select($"doc_id".as("idb"), $"sig".as("sigb"), $"shs".as("shb")), "idb")
      j.select(
          size(filter(zip_with($"siga", $"sigb", (x, y) => x === y), b => b))
            .cast(LongType).as("matches"),
          size(array_intersect($"sha", $"shb")).cast(LongType).as("inter"),
          (size($"sha") + size($"shb")).cast(LongType).as("sz2"))
        .select($"matches",
          expr("(inter * 1000000L) div (sz2 - inter)").as("exact_e6"))
        .groupBy($"matches")
        .agg(count(lit(1)).as("n_pairs"),
          sum($"exact_e6").cast(LongType).as("sum_exact_e6"),
          min($"exact_e6").as("min_exact_e6"),
          max($"exact_e6").as("max_exact_e6"))
        .select($"matches", expr("(matches * 1000000L) div 32").as("est_e6"),
          $"n_pairs", $"sum_exact_e6", $"min_exact_e6", $"max_exact_e6")
        .orderBy($"matches")
    }
  )

  // --------------------------------- LSH band-bucket occupancy (c2bo)
  /** LSH band-bucket occupancy census — the banding twin of
    * `c3_ivf_balance`: per band, how many buckets the corpus hashes
    * into, the fattest bucket, the singleton count, and the exact
    * candidate-pair cost Σ sz·(sz−1)/2 the bucket self-join will
    * generate. THE number that prices `c2_dedup_pairs` before running
    * it: a boilerplate-heavy corpus shows one fat bucket per band
    * (quadratic pair cost, the df-cap failure mode's LSH sibling), a
    * clean corpus shows singletons. Reuses the production signature
    * index ([[lshIndex]]) and the `mhBandCtes` oracle replay verbatim.
    *
    * Scale shape: signature build is map-side; the bucket census is one
    * partial-agg shuffle on (band_id, band_hash); the per-band rollup is
    * 8 rows. No joins.
    */
  private val c2bo = QuerySpec(
    "c2_band_occupancy",
    "LSH band-bucket occupancy: per band, bucket count, max bucket, singletons, and the exact candidate-pair cost sum(sz*(sz-1)/2) the bucket self-join would generate — prices near-dup candidate generation before running it.",
    Some(s"""WITH $mhBandCtes,
            |bs AS (SELECT band_id, band_hash, CAST(COUNT(*) AS BIGINT) AS sz
            |       FROM band GROUP BY band_id, band_hash)
            |SELECT CAST(band_id AS BIGINT) AS band_id,
            |  COUNT(*) AS n_buckets,
            |  CAST(SUM(sz) AS BIGINT) AS n_docs,
            |  CAST(MAX(sz) AS BIGINT) AS max_bucket,
            |  CAST(COALESCE(SUM(CASE WHEN sz = 1 THEN 1 END), 0) AS BIGINT) AS n_singletons,
            |  CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS cand_pairs
            |FROM bs GROUP BY band_id ORDER BY band_id""".stripMargin),
    (s, d) => {
      import s.implicits._
      lshIndex(Tables.documents(s, d))
        .groupBy($"band_id", $"band_hash").agg(count(lit(1)).as("sz"))
        .groupBy($"band_id".cast(LongType).as("band_id"))
        .agg(count(lit(1)).as("n_buckets"),
          sum($"sz").cast(LongType).as("n_docs"),
          max($"sz").as("max_bucket"),
          sum(when($"sz" === 1, 1L).otherwise(0L)).cast(LongType).as("n_singletons"),
          sum(expr("sz * (sz - 1) div 2")).cast(LongType).as("cand_pairs"))
        .orderBy($"band_id")
    }
  )

  // ------------------------------------ exact-dedup savings KPI (c1w)
  /** Dedup savings scorecard — the KPI view over [[c1]]'s group table:
    * how many documents and how many BYTES exact dedup sheds, as one
    * row (doc counts, byte totals, exact-ppm savings). The number a
    * curation run reports before/after; byte mass matters more than doc
    * count because duplicated docs skew long (templates). Exact
    * integers end-to-end — `length(text)` is identical per group by
    * definition of exact dedup, so `MIN` inside the group is just the
    * shared value.
    *
    * Scale shape: the same single text-keyed partial-agg shuffle as
    * c1_dedup_exact, folded to one row by a second (global) aggregate.
    */
  private val c1w = QuerySpec(
    "c1w_dedup_savings",
    "Exact-dedup savings scorecard: docs/bytes total vs kept vs shed with exact-ppm byte savings — one text-keyed partial-agg shuffle folded to a single KPI row.",
    Some("""WITH g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_copies,
              CAST(MIN(length(text)) AS BIGINT) AS len
              FROM documents GROUP BY text)
            SELECT CAST(SUM(n_copies) AS BIGINT) AS n_docs,
              COUNT(*) AS n_unique,
              CAST(SUM(n_copies * len) AS BIGINT) AS bytes_total,
              CAST(SUM(len) AS BIGINT) AS bytes_kept,
              CAST(SUM((n_copies - 1) * len) AS BIGINT) AS bytes_shed,
              CAST((SUM((n_copies - 1) * len) * 1000000) // SUM(n_copies * len) AS BIGINT)
                AS savings_ppm
            FROM g"""),
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .groupBy($"text")
        .agg(count(lit(1)).as("n_copies"), min(length($"text")).cast(LongType).as("len"))
        .agg(sum($"n_copies").cast(LongType).as("n_docs"),
          count(lit(1)).as("n_unique"),
          sum($"n_copies" * $"len").cast(LongType).as("bytes_total"),
          sum($"len").cast(LongType).as("bytes_kept"),
          sum(($"n_copies" - 1) * $"len").cast(LongType).as("bytes_shed"))
        .select($"n_docs", $"n_unique", $"bytes_total", $"bytes_kept", $"bytes_shed",
          expr("(bytes_shed * 1000000L) div bytes_total").as("savings_ppm"))
    }
  )

  val specs: Seq[QuerySpec] = Seq(c1, c2, c2pairs, c3, c3r, c4, c5, c5b, c5c, c5d, c3hb, c2me, c2bo, c1w)
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Output-level algebraic invariants of the r11 Tier-B additions — checks
  * that hold for ANY input, asserted on the declared queries' own outputs
  * at sf0.001. These complement the DuckDB oracle (which pins exact
  * values for one corpus) with properties a refactor must preserve on
  * every corpus.
  */
class QueryInvariantsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session
  private val sf = SparkFixture.sfDir

  private def run(name: String) = Registry.queries(name)(spark, sf)

  test("b52 closure rows satisfy the binary-heap identity ancestor = user >> depth") {
    val rows = run("b52_hierarchy_closure").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (u, a, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a == (u >> d), s"($u, $a, $d) violates ancestor = user >> depth")
      assert(a >= 1L && d >= 1L)
    }
    // chains are complete: every user's max-depth ancestor is the root
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      assert(rs.map(_.getLong(1)).min == 1L, s"user $u chain does not reach the root")
    }
  }

  test("temperature-mix kept sets are nested in α (1/4 ≤ 1/2 ≤ 5/8 ≤ 3/4)") {
    // rate_s = (n_min/n_s)^(1-α) is monotone increasing in α for every
    // source, and the md5-draw keep rule is a threshold on that rate — so
    // per-source kept counts must be nondecreasing along the α ladder,
    // with the smallest source kept whole (rate = 1) at every α
    def keptBySource(name: String): Map[String, (Long, Long)] =
      run(name).collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ladder = Seq("c1m_temperature_mix_a25", "c1l_temperature_mix",
      "c1v_temperature_mix_dyadic", "c1n_temperature_mix_a75").map(keptBySource)
    val sources = ladder.head.keySet
    assert(ladder.forall(_.keySet == sources), "α variants disagree on sources")
    for (s <- sources; i <- 0 until ladder.length - 1) {
      val (tot0, k0) = ladder(i)(s)
      val (tot1, k1) = ladder(i + 1)(s)
      assert(tot0 == tot1, s"source $s totals differ across α")
      assert(k0 <= k1, s"source $s kept counts not monotone in α: $k0 > $k1 at step $i")
    }
    val minSource = ladder.head.minBy(_._2._1)._1
    ladder.foreach { m =>
      val (tot, kept) = m(minSource)
      assert(kept == tot, s"smallest source $minSource not kept whole")
    }
    // strict separation needs skewed source sizes (sf0.001's sources are
    // near-uniform, so thresholds there may not flip any doc): on a
    // synthetic 8-vs-512 corpus the big source's keep rate is
    // (1/64)^(1-α) ≈ 0.044 / 0.125 / 0.21 / 0.354 along the ladder —
    // the dyadic rung must sit strictly inside the band
    import spark.implicits._
    val docs = ((1 to 8).map(i => (i.toLong, "small", s"s text $i")) ++
      (1 to 512).map(i => (1000L + i, "big", s"b text $i ${i * 7}")))
      .toDF("doc_id", "source", "text")
    def keptBig(num: Int, den: Int): Long =
      graft.operators.TierCText.temperatureMixResampleDyadic(spark, docs, num, den)
        .collect().find(_.getString(0) == "big").get.getLong(2)
    val ks = Seq(keptBig(1, 2), keptBig(2, 2), keptBig(5, 3), keptBig(3, 2))
    assert(ks(0) < ks(1) && ks(1) < ks(2) && ks(2) < ks(3),
      s"α ladder not strictly separated on the skewed corpus: $ks")
  }

  test("b49 diff classes match their modular derivation") {
    run("b49_snapshot_diff").collect().foreach { r =>
      val (k, cls) = (r.getLong(0), r.getString(1))
      cls match {
        case "added"   => assert(k % 13 == 0 && k % 11 != 0, s"$k added")
        case "removed" => assert(k % 11 == 0 && k % 13 != 0, s"$k removed")
        case "changed" => assert(k % 7 == 0 && k % 11 != 0 && k % 13 != 0, s"$k changed")
        case other     => fail(s"unknown class $other")
      }
    }
  }

  test("b57 cumulative reach is nondecreasing and ends at the distinct-user count") {
    import spark.implicits._
    val rows = run("b57_cumulative_reach").collect()
    val cum = rows.map(_.getLong(2))
    assert(cum.zip(cum.tail).forall { case (a, b) => b > a }) // strictly: every bucket adds >= 1
    assert(cum.last == graft.sources.Tables.events(spark, sf)
      .select($"user_id").distinct().count())
    assert(rows.map(_.getLong(1)).sum == cum.last)
  }

  test("b56 merged top-k equals the directly computed top-k") {
    import spark.implicits._
    val got = run("b56_topk_merge").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val direct = graft.sources.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice".cast("decimal(18,2)").cast("double").as("p"))
      .orderBy($"p".desc, $"o_orderkey").limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == direct)
  }

  test("b55 attributed rows carry an in-window touch; unattributed rows are fully null") {
    run("b55_attribution").collect().foreach { r =>
      val attributed = r.getBoolean(6)
      if (attributed) {
        assert(!r.isNullAt(3) && !r.isNullAt(4) && !r.isNullAt(5))
        val touchTs = r.getTimestamp(5).getTime
        val purchaseTs = r.getTimestamp(2).getTime
        assert(touchTs <= purchaseTs && touchTs >= purchaseTs - 24L * 3600 * 1000)
        assert(Set("click", "view")(r.getString(4)))
      } else {
        assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
      }
    }
  }

  test("b54 PIT join: every probe matches at most one version, valid at its timestamp") {
    val rows = run("b54_pit_join").collect()
    // <= 1 survivor per probe (interval partition) — and here exactly one,
    // since every probe is after its user's first event
    val perProbe = rows.groupBy(_.getLong(0)).map(_._2.size)
    assert(perProbe.forall(_ == 1))
    rows.foreach { r =>
      // state_at_probe is one of the event types — a real version
      assert(Set("click", "view", "purchase", "signup", "error")(r.getString(4)))
    }
  }

  test("b53 EWMA: single-event users equal floor(value*1e6); all users bounded by history range") {
    import spark.implicits._
    val byUser = graft.sources.Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), min($"value").as("lo"), max($"value").as("hi"),
        min_by($"value", struct($"ts", $"event_id")).as("first_v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    run("b53_ewma").collect().foreach { r =>
      val (u, n, e) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (cnt, lo, hi, firstV) = byUser(u)
      assert(n == cnt)
      if (cnt == 1L) assert(e == math.floor(firstV * 1e6).toLong, s"user $u single-event")
      // a convex combination of history values stays inside [lo, hi]
      assert(e >= math.floor(lo * 1e6).toLong && e <= math.ceil(hi * 1e6).toLong, s"user $u bounds")
    }
  }

  test("c4 novelty: values in [0, 1e6]; lowest-id doc of every source is fully novel or shares grams") {
    val rows = run("c4_novelty").collect()
    rows.foreach { r =>
      val (g, nv, e6) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nv >= 0 && nv <= g && e6 >= 0 && e6 <= 1000000L)
      assert(e6 == nv * 1000000L / g)
    }
    // the globally first doc owns every one of its grams
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(3) == 1000000L, s"first doc not fully novel: $first")
  }

  test("c2 jaccard histogram: deciles within [1, 9] at the 0.1 floor, counts positive") {
    run("c2_jaccard_hist").collect().foreach { r =>
      assert(r.getLong(0) >= 1L && r.getLong(0) <= 9L)
      assert(r.getLong(1) > 0L)
    }
  }

  test("a11yy dissolve: merge-order invariance and union-vs-sum bounds") {
    import spark.implicits._
    val base = run("a11yy_dissolve").collect()
    assert(base.nonEmpty)
    // merge-order invariance: the same input under a different (skewed,
    // coalesced) partitioning must dissolve to the identical result —
    // the property an order-sensitive union accumulator would break
    val shuffled = {
      val ev = graft.sources.Tables.events(spark, sf).repartition(3, $"event_id" % 7)
      val dir = java.nio.file.Files.createTempDirectory("a11yy_repart").toString
      ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
      for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"))
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(s"$dir/$t.parquet"),
          java.nio.file.Paths.get(s"$sf/$t.parquet"))
      Registry.queries("a11yy_dissolve")(spark, dir).collect()
    }
    assert(base.map(_.toString).toSeq == shuffled.map(_.toString).toSeq,
      "dissolve result changed under a different input partitioning")
    // union <= sum of parts: each member diamond covers <= ceil(2r/8)^2
    // cells, and the union must be smaller than members x that bound
    val members = graft.sources.Tables.events(spark, sf)
      .groupBy(($"user_id" % 25).as("gid")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    base.foreach { r =>
      val (gid, cells) = (r.getLong(0), r.getLong(1))
      assert(cells > 0L)
      assert(cells <= members(gid) * 256L, s"gid $gid union exceeds the per-member bound")
      assert(r.getLong(3) >= r.getLong(2) && r.getLong(5) >= r.getLong(4))
    }
  }

  test("c3 embedding drift: cohort counts partition the corpus, shift matches sums") {
    import spark.implicits._
    val total = graft.sources.Tables.embeddings(spark, sf).count()
    run("c3_embed_drift").collect().foreach { r =>
      val (na, nb) = (r.getLong(1), r.getLong(2))
      val (sa, sb, shift) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(na + nb == total)
      assert(shift == sa * nb - sb * na)
    }
  }

  test("c4 chunk dedup: kept <= total per source, corpus-wide kept = distinct fingerprints") {
    import spark.implicits._
    val rows = run("c4_chunk_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nChunks, nKept) = (r.getLong(2), r.getLong(3))
      val (tokTotal, tokKept, retained) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(nKept >= 1 && nKept <= nChunks)
      assert(tokKept <= tokTotal)
      assert(retained == tokKept * 1000000 / tokTotal)
    }
    // every distinct chunk keeps exactly one instance corpus-wide
    val keptTotal = rows.map(_.getLong(3)).sum
    val distinctFps = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", filter(split(lower($"text"), " "), t => t =!= "").as("toks"))
      .filter(size($"toks") > 0)
      .select(explode(transform(
        sequence(lit(0L), ceil(size($"toks") / 8.0).cast("long") - 1),
        j => md5(array_join(slice($"toks", (j * 8 + 1).cast("int"), lit(8)), " ")))).as("fp"))
      .distinct().count()
    assert(keptTotal == distinctFps, s"kept $keptTotal != distinct chunks $distinctFps")
  }

  test("c3 binary hamming: distances in [0, 64], top-3 per vector, nondecreasing in rank") {
    val rows = run("c3_binary_hamming").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (ida, rs) =>
      val byRank = rs.sortBy(_.getLong(3))
      assert(byRank.length <= 3)
      val ds = byRank.map(_.getLong(2))
      assert(ds.forall(d => d >= 0 && d <= 64), s"$ida distance out of bit range")
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b }, s"$ida ranks not by distance")
    }
  }

  test("c3 rand proj: every projection bounded by the vector's own quantized L1 mass") {
    import spark.implicits._
    // |p_j| = |Σ ±q_i| <= Σ|q_i| for every sign assignment — a wrong sign
    // matrix or a lost element breaks the bound's tightness class
    val l1 = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", aggregate(transform($"embedding",
        x => abs(floor(x.cast("double") * 1000000.0))), lit(0L), (a, b) => a + b).as("l1"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    run("c3_rand_proj").collect().foreach { r =>
      val id = r.getLong(0)
      val bound = l1(id) + 64 // +1 per element for the floor(|.|) vs |floor(.)| gap
      (1 to 4).foreach(i => assert(math.abs(r.getLong(i)) <= bound, s"vec $id p${i - 1}"))
      assert(r.getLong(5) <= 16L * bound, s"vec $id l1_16")
    }
  }

  test("c2 kcore: residual degree >= 2 for every survivor, survivors closed under edges") {
    val rows = run("c2_kcore").collect()
    assert(rows.nonEmpty, "2-core empty at this sf — graph construction regressed")
    rows.foreach { r =>
      assert(r.getLong(1) >= 2, s"doc ${r.getLong(0)} survived with degree ${r.getLong(1)}")
    }
  }

  test("b61 profile: one row per column, distincts <= rows, numeric xor string min/max") {
    val rows = run("b61_profile").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"))
    rows.foreach { r =>
      val (n, nNull, nDist) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nNull >= 0 && nNull <= n)
      assert(nDist >= 1 && nDist <= n - nNull)
      val hasNum = !r.isNullAt(4)
      val hasStr = !r.isNullAt(6)
      assert(hasNum ^ hasStr, s"${r.getString(0)} must report exactly one min/max family")
      if (hasNum) assert(r.getDouble(4) <= r.getDouble(5))
      else assert(r.getString(6) <= r.getString(7))
    }
  }

  test("b62 groupwise min: one row per part present in lineitem, price is that part's true min") {
    import spark.implicits._
    val expect = graft.sources.Tables.lineitem(spark, sf)
      .groupBy($"l_partkey")
      .agg(min($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("mn"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = run("b62_groupwise_min").collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "duplicate part rows")
    assert(rows.length == expect.size)
    rows.foreach { r =>
      assert(r.getDouble(5) == expect(r.getLong(0)), s"part ${r.getLong(0)} min price")
    }
  }

  test("c4 reject reasons: rule counts bounded by docs, pass consistent with rules") {
    run("c4_reject_reasons").collect().foreach { r =>
      val n = r.getLong(1)
      val rules = (2 to 7).map(r.getLong)
      val (nPass, passE6) = (r.getLong(8), r.getLong(9))
      rules.foreach(c => assert(c >= 0 && c <= n))
      // pass can't exceed docs minus the largest single-rule rejection
      assert(nPass <= n - rules.max)
      assert(passE6 == nPass * 1000000 / n)
    }
  }

  test("b63 OHLC: low <= open/close <= high, volumes partition the events") {
    val rows = run("b63_ohlc").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(l <= o && o <= h, s"open outside [low, high] in ${r.getString(0)}")
      assert(l <= c && c <= h, s"close outside [low, high] in ${r.getString(0)}")
    }
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(6)).sum == total, "bar volumes must partition all events")
  }

  test("c5c QL: scores strictly negative (log-probs), ranks dense 1..10") {
    val rows = run("c5c_ql_dirichlet").collect()
    assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length))
    rows.foreach(r => assert(r.getLong(1) < 0, "a smoothed log-likelihood sum must be negative"))
    // rank order agrees with score order (ties broken by doc_id upstream)
    val byRank = rows.sortBy(_.getLong(2)).map(_.getLong(1))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("c1s source overlap: canonical pair order, counts bounded by either side's duplicated chunks") {
    import spark.implicits._
    val rows = run("c1s_source_overlap").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(0) <= r.getString(1)), "pairs must be canonical a <= b")
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
    rows.foreach(r => assert(r.getLong(2) >= 1))
  }

  test("a11ae validity: exactly the planted bowtie cohort is invalid") {
    import spark.implicits._
    val rows = run("a11ae_validity").collect()
    val invalid = rows.map(_.getLong(2)).sum
    val expected = graft.sources.Tables.events(spark, sf)
      .filter($"user_id" % 5 === 0).count()
    assert(invalid == expected,
      s"invalid rings $invalid != planted bowties $expected — the predicate drifted")
    rows.foreach { r =>
      if (r.getLong(2) > 0) assert(!r.isNullAt(3)) else assert(r.isNullAt(3))
    }
  }

  test("c2_lsh_recall: caught bounded by truth, exact integer recall, top decile saturates") {
    val rows = run("c2_lsh_recall").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dec, nTruth, nCaught, recE6) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dec >= 3 && dec <= 9, s"decile $dec outside the 0.3 floor range")
      assert(nCaught >= 0 && nCaught <= nTruth)
      assert(recE6 == nCaught * 1000000 / nTruth, "recall must replay the integer division")
    }
    // near-identical pairs (decile 9 ⇒ s ≥ 0.9) collide in some band with
    // probability 1−(1−s⁴)⁸ > 0.9999 — at fixture scale they must ALL be caught
    rows.find(_.getLong(0) == 9).foreach(r => assert(r.getLong(2) == r.getLong(1),
      "a >= 0.9-Jaccard pair escaped all 8 bands — banding or signature drifted"))
  }

  test("a11ad hexbin: totals partition the events, neighbors-distinct hex keys") {
    val rows = run("a11ad_hexbin").collect()
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total, "hexbin counts must partition all events")
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("a11ah rect union: bounded by envelope above, by largest member and sum below") {
    import spark.implicits._
    // recompute the fixture's per-rect areas independently of the query
    val rects = graft.sources.Tables.events(spark, sf)
      .select(($"event_id" % 500).as("gid"),
        ((lit(20) + $"event_id" % 80) * (lit(20) + $"user_id" % 70)).as("ra"))
      .groupBy($"gid")
      .agg(sum($"ra").as("sumA"), max($"ra").as("maxA"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = run("a11ah_rect_union").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (gid, n, area) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (minx, maxx, miny, maxy) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      val env = (maxx - minx) * (maxy - miny)
      val (sumA, maxA) = rects(gid)
      assert(n >= 1 && area > 0)
      assert(area <= env, s"gid $gid: union $area exceeds envelope $env")
      assert(area >= maxA, s"gid $gid: union $area below largest member $maxA")
      assert(area <= sumA, s"gid $gid: union $area above the member-area sum $sumA")
    }
    // overlap must actually occur somewhere, or the sweep degenerates to a sum
    assert(rows.exists(r => r.getLong(2) < rects(r.getLong(0))._1),
      "no group overlaps — fixture lost its interval-merge coverage")
  }

  test("c4 good-turing: masses bounded, S(r) positive, adjusted counts replay the division") {
    val rows = run("c4_good_turing").collect()
    assert(rows.nonEmpty)
    val rs = rows.map(_.getLong(0))
    assert(rs.sorted.sameElements(rs) && rs.distinct.length == rs.length)
    assert(rows.map(_.getLong(3)).sum <= 1000000L, "observed mass cannot exceed 1")
    val byR = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (rr, sr, gt) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(sr >= 1)
      val sNext = byR.getOrElse(rr + 1, 0L)
      // r+1 <= 20 lies inside the emitted window, so an absent row there
      // means S(r+1) is truly zero; at the window edge S(21) is unknowable
      if (rr < 20)
        assert(gt == (rr + 1) * sNext * 1000000L / sr,
          s"r=$rr: gt_e6 $gt does not replay (r+1)S(r+1)*1e6/S(r)")
    }
    // the defining GT shape on any natural corpus: singletons dominate
    assert(byR.getOrElse(1L, 0L) > 0L, "no singleton trigrams — fixture degenerate")
  }

  test("c4 stupid backoff: held-out rows only, NLL nonnegative, closed vocab has no OOV") {
    import spark.implicits._
    val rows = run("c4_stupid_backoff").collect()
    assert(rows.nonEmpty)
    val heldOut = graft.sources.Tables.documents(spark, sf)
      .filter(!substring(md5($"text"), 1, 1)
        .isin("0", "1", "2", "3", "4", "5", "6", "7"))
      .filter(size(filter(split(lower($"text"), " "), t => t =!= "")) >= 2)
      .count()
    assert(rows.length.toLong == heldOut, "one row per scoreable held-out doc")
    rows.foreach { r =>
      val (nBig, nBo, nOov, nll, avg) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nBig >= 1 && nBo >= 0 && nBo <= nBig)
      assert(nOov == 0, "closed-vocab corpus must never hit the OOV floor branch")
      assert(nll >= 0, "log probs are <= 0, so the NLL sum must be >= 0")
      assert(avg == math.floor(nll.toDouble / nBig.toDouble).toLong,
        "avg must replay the floor division")
    }
  }

  test("c2 assortativity: moment identities and r in [-1e6, 1e6]") {
    val r = run("c2_assortativity").collect()
    assert(r.length == 1)
    val (m, sx, sxy, sx2, re6) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
    assert(m % 2 == 0, "both directions of every edge must be counted")
    assert(sx >= m, "every endpoint has degree >= 1")
    // Cauchy-Schwarz on the symmetric edge list: |Sxy| <= Sx2
    assert(sxy <= sx2 && sxy >= -sx2)
    assert(re6 >= -1000000L && re6 <= 1000000L, s"r out of range: $re6")
    if (m > 0 && m * sx2 - sx * sx > 0)
      assert(re6 == math.floor((m * sxy - sx * sx).toDouble
        / (m * sx2 - sx * sx).toDouble * 1000000.0).toLong, "r must replay the moment division")
  }

  test("b110 window funnel: levels partition the viewers and never exceed the unconstrained funnel") {
    val rows = run("b110_window_funnel").collect()
    assert(rows.nonEmpty)
    val byLevel = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byLevel.keySet.subsetOf(Set(1L, 2L, 3L)))
    rows.foreach { r =>
      val (lvl, n, sumS, maxS) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0)
      if (lvl < 3) assert(sumS == 0 && maxS == 0, "conversion time only exists at level 3")
      else {
        assert(maxS > 0 && sumS >= maxS)
        // two 24 h step deadlines bound any conversion at 48 h
        assert(maxS <= 48L * 3600, s"conversion $maxS s exceeds the two-step deadline")
      }
    }
    // the unconstrained b38 stage counts dominate the windowed ones
    val b38 = run("b38_funnel").collect()(0)
    val (nView, nClick, nPurch) = (b38.getLong(0), b38.getLong(1), b38.getLong(2))
    assert(byLevel.values.sum == nView, "levels must partition exactly the viewers")
    assert(byLevel.getOrElse(2L, 0L) + byLevel.getOrElse(3L, 0L) <= nClick)
    assert(byLevel.getOrElse(3L, 0L) <= nPurch)
  }

  test("c6i media dedup: clusters cover exactly the paired docs, rep is the keep-best member") {
    val pairs = run("c6h_dhash_pairs").collect()
    val paired = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val clusters = run("c6i_media_dedup").collect()
    assert(clusters.nonEmpty)
    assert(clusters.map(_.getLong(1)).sum == paired.size.toLong,
      "cluster sizes must partition exactly the paired docs")
    clusters.foreach { r =>
      val (cid, sz, rep, total, shed) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(sz >= 2, s"cluster $cid smaller than a pair")
      assert(paired.contains(rep) && cid <= rep,
        "rep must be a paired member; cluster id is the min member")
      assert(shed >= 0 && shed < total, "shed keeps at least the representative's bytes")
    }
  }

  test("c4 datacard: source totals partition the corpus, shares and divisions replay") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val rows = run("c4_datacard").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == docs.count(), "doc counts must partition the corpus")
    rows.foreach { r =>
      val (nDocs, nTok, nChars) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (avgLen, dupPpm, nTypes, langPpm) =
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(8))
      assert(nTok > 0 && nTypes > 0 && nTypes <= nTok)
      assert(avgLen == nChars / nDocs)
      assert(dupPpm >= 0 && dupPpm < 1000000L)
      assert(langPpm > 0 && langPpm <= 1000000L, "dominant language share must be a plurality")
    }
  }

  test("b111 benford: nine digits partition the orders, expectations sum to ~1, dev replays") {
    import spark.implicits._
    val rows = run("b111_benford").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L), "all nine leading digits must appear")
    assert(rows.map(_.getLong(1)).sum ==
      graft.sources.Tables.orders(spark, sf).count())
    // Benford expectations are a fixed distribution: sum within floor slack
    val expSum = rows.map(_.getLong(3)).sum
    assert(expSum > 999990L && expSum <= 1000000L, s"exp ppm sum $expSum")
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3), "dev = obs - exp")
      assert(r.getLong(3) > 0)
    }
  }

  test("c6j scene cuts: frame counts match payload length, cuts bounded by transitions") {
    import spark.implicits._
    val lens = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", length($"text").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = run("c6j_scene_cut").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nF, nC, first, maxD) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nF == lens(id) / 128, s"media $id frame count")
      assert(nF >= 2 && nC <= nF - 1, "cuts are transitions, at most n_frames - 1")
      if (nC > 0) assert(first >= 1 && first <= nF - 1 && maxD > 300)
      else assert(first == -1L)
    }
    assert(rows.exists(_.getLong(2) > 0), "fixture lost its cut coverage")
  }

  test("b112 uptime: intervals partition the user's events, merged time bounded both ways") {
    import spark.implicits._
    val perUser = graft.sources.Tables.events(spark, sf)
      .groupBy($"user_id").agg(
        count(lit(1)).as("n"),
        sum(lit(60L) + floor($"value").cast("long") % 540).as("rawS"),
        max(lit(60L) + floor($"value").cast("long") % 540).as("maxS"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val rows = run("b112_uptime").collect()
    assert(rows.length == perUser.size, "one row per user")
    rows.foreach { r =>
      val (u, nIv, nIsl, busy, longest) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (n, rawS, maxS) = perUser(u)
      assert(nIv == n, s"user $u interval count")
      assert(nIsl >= 1 && nIsl <= nIv)
      // merged busy time: at most the raw sum, at least the longest member
      // (intervals are whole seconds long, so the island holding the max
      // interval spans >= maxS s and the single end-stage floor keeps both
      // bounds exact — no sub-second slack needed)
      assert(busy <= rawS && busy >= maxS, s"user $u busy $busy vs raw $rawS / max $maxS")
      assert(longest <= busy && longest >= maxS)
    }
    // overlap must occur somewhere or the merge is vacuous
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)),
      "no user has overlapping intervals - merge coverage lost")
  }

  test("c6k keyframes: shot structure is exactly c6j's cut structure") {
    val cuts = run("c6j_scene_cut").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap // media -> (n_frames, n_cuts)
    val shots = run("c6k_keyframes").collect()
    assert(shots.nonEmpty)
    val byMedia = shots.groupBy(_.getLong(0))
    assert(byMedia.keySet == cuts.keySet, "same media on both sides")
    byMedia.foreach { case (m, ss) =>
      val (nFrames, nCuts) = cuts(m)
      assert(ss.length.toLong == nCuts + 1, s"media $m: shots must be cuts + 1")
      assert(ss.map(_.getLong(4)).sum == nFrames, s"media $m: shot frames must partition the frames")
      val first = ss.minBy(_.getLong(1))
      assert(first.getLong(1) == 0L && first.getLong(2) == 0L,
        s"media $m: shot 0 keyframe must be frame 0")
      // keyframes strictly increase across shots; md5s are well-formed
      val kfs = ss.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(kfs.zip(kfs.tail).forall { case (a, b) => b > a })
      ss.foreach(r => assert(r.getString(3).length == 32))
    }
  }

  test("b113 skyline: rows are mutually non-dominated and dominate every excluded order") {
    import spark.implicits._
    val rows = run("b113_skyline").collect()
    assert(rows.nonEmpty)
    // within a group, skyline points form a strictly decreasing staircase:
    // sorted by cents asc, dates must strictly DECREASE (else dominated)
    rows.groupBy(r => (r.getString(0), r.getDate(1).toString)).foreach { case (g, rs) =>
      val stair = rs.sortBy(r => (r.getLong(2), r.getLong(3)))
      val cents = stair.map(_.getLong(2))
      val days = stair.map(_.getLong(3))
      assert(cents.distinct.length == cents.length, s"$g: duplicate cents on the front")
      assert(days.zip(days.tail).forall { case (a, b) => b < a },
        s"$g: dates must strictly decrease along the price-sorted front")
    }
    // spot-check completeness on one group: every order is dominated by
    // or IS a skyline point
    val one = rows.head
    val (gp, gm) = (one.getString(0), one.getDate(1))
    val front = rows.filter(r => r.getString(0) == gp && r.getDate(1) == gm)
      .map(r => (r.getLong(2), r.getLong(3)))
    val members = graft.sources.Tables.orders(spark, sf)
      .filter($"o_orderpriority" === gp &&
        date_trunc("month", $"o_orderdate").cast("date") === lit(gm))
      .select(floor($"o_totalprice" * 100.0).cast("long"),
        datediff($"o_orderdate".cast("date"), to_date(lit("1970-01-01"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    members.foreach { case (c, d) =>
      assert(front.exists { case (fc, fd) =>
        (fc == c && fd == d) || (fc <= c && fd <= d && (fc < c || fd < d)) },
        s"order ($c, $d) in $gp/$gm neither on nor under the front")
    }
  }

  test("c4_kneser_ney branch censuses partition n_big and the interp branch fires") {
    val rows = run("c4_kneser_ney").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nBig, nInterp, nCtx, nOov) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (nll, avg) = (r.getLong(5), r.getLong(6))
      assert(nInterp + nCtx + nOov <= nBig, "branch counts exceed bigram count")
      assert(nll > 0L, "every KN probability is < 1, so NLL must be positive")
      assert(avg == math.floor(nll.toDouble / nBig.toDouble).toLong,
        "avg must be the floored per-doc mean of the quantized sum")
    }
    // the eighth train split exists exactly so this is non-zero: a refactor
    // that silently stops firing the continuation-interpolation branch
    // (e.g. a join key typo making every bigram 'seen') must fail here
    assert(rows.map(_.getLong(2)).sum > 0L, "interp branch never fired")
  }

  test("c4_ks_drift: D is a valid normalized sup-distance and sides sum to the corpus") {
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    val rows = run("c4_ks_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nSrc, nRest, dNum, ks) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(nSrc + nRest == nDocs, "leave-one-out sides must sum to the corpus")
      assert(dNum >= 0L && dNum <= nSrc * nRest, "D numerator outside [0, n_src*n_rest]")
      assert(ks >= 0L && ks <= 1000000L, "KS statistic outside [0, 1]")
      assert(ks == dNum * 1000000L / (nSrc * nRest), "ks_e6 must be the integer quotient")
    }
  }

  test("c1y_rendezvous: all docs placed, minimal movement in the HRW band") {
    val rows = run("c1y_rendezvous").collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L until 8L),
      "every 8-shard bucket must be non-empty at this corpus size")
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == docs, "every doc placed exactly once")
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(3) * 1000000L / r.getLong(1), "moved_e6 quotient")
    }
    // THE rendezvous property: adding the 9th shard moves roughly 1/9 of
    // the corpus (each doc moves iff the new shard's weight wins — an
    // md5-uniform 1-in-9 event). Allow a generous small-sample band.
    val movedFrac = rows.map(_.getLong(3)).sum.toDouble / docs
    assert(movedFrac > 0.02 && movedFrac < 0.25,
      f"moved fraction $movedFrac%.3f outside the ~1/9 HRW band")
  }

  test("c6v_varint: wire framing identity, varint overhead bounded") {
    val rows = run("c6v_varint").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, payload, varint, wire) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // per message: 4 tag bytes + 2 length varints (1-2 bytes each) + the
      // two value varints + both payloads
      assert(varint >= 2L * n && varint <= 10L * n, "value varints are 1..5 bytes each")
      assert(wire >= payload + varint + 6L * n && wire <= payload + varint + 8L * n,
        s"${r.getString(0)}: framing outside the 4-tag + 2-length-varint band")
    }
  }

  test("c6u_zip_dir: fixed-framing byte identity per archive") {
    val rows = run("c6u_zip_dir").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, entries, payload, archive) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(entries == 2L * n, "two entries per archive")
      // per archive: 2 local headers (39+38 incl. names) + 2 central
      // records (55+54) + EOCD 22 = 208 framing bytes around the payload
      assert(archive == payload + 208L * n,
        s"${r.getString(0)}: framing identity broken ($archive vs $payload + 208*$n)")
    }
  }

  test("c4_filter_overlap: set algebra identities, quality-kept monotone in threshold") {
    val rows = run("c4_filter_overlap").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val byThr = rs.sortBy(_.getLong(1))
      var prevQ = Long.MaxValue
      byThr.foreach { r =>
        val (tot, tq, td, tb, agree) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
        assert(tb <= math.min(tq, td) && tq <= tot && td <= tot, s"$src: set bounds")
        assert(td > 0L, s"$src: keep-first dedup always keeps at least one doc")
        val union = tq + td - tb
        assert(agree == (if (union == 0L) 0L else tb * 1000000L / union),
          s"$src: agreement must be the exact Jaccard quotient")
        assert(tq <= prevQ, s"$src: quality-kept mass must shrink as the bar rises")
        prevQ = tq
      }
    }
  }

  test("b123_holt_winters: init exact, warmup forecasts carry no season, recurrences bounded") {
    val rows = run("b123_holt_winters").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val seq = rs.sortBy(_.getLong(1))
      assert(seq.length > 24, s"$t: need more than one season of hours")
      val r0 = seq.head
      assert(r0.getLong(3) == r0.getLong(2) * 1000000L && r0.getLong(4) == 0L &&
        r0.getLong(5) == 0L, s"$t: init row must be (l=x, b=0, s=0)")
      // the first 24 rows are the documented warmup: forecast = l + b
      seq.take(24).foreach { r =>
        assert(r.getLong(6) == r.getLong(3) + r.getLong(4),
          s"$t: warmup forecast must carry no season term")
      }
      // after warmup the forecast differs from l+b by exactly one seasonal
      // slot, which is bounded by the largest residual ever seeded
      val maxAbsSeason = seq.map(r => math.abs(r.getLong(5))).max
      seq.drop(24).foreach { r =>
        assert(math.abs(r.getLong(6) - r.getLong(3) - r.getLong(4)) <= maxAbsSeason,
          s"$t: seasonal forecast term outside the observed slot range")
      }
    }
  }

  test("c2_adamic_adar: scores bounded by the hub-cut term range, ordering total") {
    // sf0.001's near-miss graph may legitimately be empty — the invariants
    // bind whenever rows exist
    val rows = run("c2_adamic_adar").collect()
    var prev = Long.MaxValue
    rows.foreach { r =>
      val (a, b, nc, sc) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(a < b, "canonical pair order")
      assert(nc >= 1L, "a scored pair needs a common neighbor")
      // each z contributes floor(1e6/ln(dg)) with 2 <= dg <= 64
      assert(sc >= nc * 240449L && sc <= nc * 1442695L,
        s"($a,$b): score $sc outside the deg-[2,64] term band for $nc neighbors")
      assert(sc <= prev, "top-20 must be score-descending")
      prev = sc
    }
  }

  test("b122_psi: partition identity, shared total, all events bucketed") {
    val rows = run("b122_psi").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (0L until 10L))
    val termSum = rows.map(_.getLong(3)).sum
    rows.foreach { r =>
      assert(r.getLong(4) == termSum, "psi_e9 must be the shared term total on every row")
    }
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == events,
      "every event lands in exactly one bucket of exactly one half")
    // deciles were FIT on the baseline: its mass must spread over buckets
    assert(rows.count(_.getLong(1) > 0L) >= 9, "baseline deciles collapsed")
  }

  test("c4_feature_hash: signed-sum parity and magnitude bounds") {
    val rows = run("c4_feature_hash").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docs, toks) = (r.getLong(1), r.getLong(2))
      val ws = (3 to 10).map(r.getLong)
      assert(docs > 0L && toks >= docs)
      // each token contributes exactly one ±1 somewhere
      assert(ws.map(math.abs).sum <= toks)
      assert(((ws.sum - toks) % 2 + 2) % 2 == 0L,
        "total signed weight must share the token count's parity")
    }
  }

  test("a11at_areal_interp: mass conservation up to per-pair truncation") {
    val rows = run("a11at_areal_interp").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(3) > 0L)
    }
    // total transferred mass equals total zone mass (25 zones, pop k+1
    // thousand => 325k units => 325M milli) up to one truncated milli-unit
    // per (zone, cell) pair — each zone covers <= 16 cells
    val total = rows.map(_.getLong(3)).sum
    val exact = (1 to 25).map(_ * 1000L).sum * 1000L
    assert(total <= exact && total > exact - 25L * 16L,
      s"mass not conserved: $total vs $exact")
  }

  test("c6t_id3_tag: frame-layout identities hold per source") {
    val rows = run("c6t_id3_tag").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, bytes, title, sub) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n > 0L && title <= 24L * n && sub >= title,
        "subtitle carries the full text, title its 24-char prefix")
      // per track: 10 header + 3 frames x (10 + 1 encoding byte) = 43
      // fixed bytes, plus the three payloads (album len >= 4, 'srcN')
      assert(bytes == 43L * n + title + sub + r.getString(0).length.toLong * n,
        s"tag byte identity broken for ${r.getString(0)}")
    }
  }

  test("c4_quality_sweep: survival monotone in threshold, shares are the exact quotients") {
    val rows = run("c4_quality_sweep").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val byThr = rs.sortBy(_.getLong(1))
      assert(byThr.map(_.getLong(1)).toSeq == (0L until 10L).map(_ * 100000L),
        s"$src: missing thresholds")
      var prevDocs = Long.MaxValue
      var prevToks = Long.MaxValue
      byThr.foreach { r =>
        val (nd, dk, nt, tk, ds, ts) = (r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
        assert(dk <= nd && tk <= nt)
        // raising the bar can only shed documents
        assert(dk <= prevDocs && tk <= prevToks, s"$src: survival not monotone")
        assert(ds == dk * 1000000L / nd && ts == tk * 1000000L / nt)
        assert(byThr.head.getLong(3) == nd, s"$src: threshold 0 must keep everything")
        prevDocs = dk; prevToks = tk
      }
    }
  }

  test("c6s_srt_cues: timing identities and reading-speed quotient hold") {
    val rows = run("c6s_srt_cues").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tracks, cues, ms, chars, cps) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(tracks > 0L && cues >= tracks, "every track carries at least one cue")
      assert(ms == cues * 2000L, "fixed 2000 ms cue duration identity")
      assert(chars > 0L)
      assert(cps == chars * 1000000L / ms, "cps_e3 integer-quotient identity")
    }
  }

  test("c3_coreset: coverage curve monotone, bounded, over the full corpus") {
    val rows = run("c3_coreset").collect().sortBy(_.getLong(0))
    assert(rows.length > 1 && rows.head.getLong(0) == 1L)
    val nVec = rows.head.getLong(1)
    var prevMin = Long.MinValue
    var prevAvg = Long.MinValue
    rows.foreach { r =>
      val (n, mn, avg) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n == nVec, "every step covers the whole corpus")
      // adding an exemplar can only improve a running max
      assert(mn >= prevMin && avg >= prevAvg, "coverage curve must be nondecreasing")
      assert(mn <= avg && avg <= 1000000L, s"min $mn / avg $avg out of order or above cos=1")
      prevMin = mn; prevAvg = avg
    }
  }

  test("c6q_wav_rms: PCM16 stats bounded by the sample alphabet") {
    val rows = run("c6q_wav_rms").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (clips, ns, sumSq, peak, flips, rms) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(clips > 0L && ns >= clips)
      // centered ASCII-pair samples: |v| < 16384 always
      assert(peak > 0L && peak < 16384L)
      assert(sumSq <= ns * peak * peak, "energy bounded by n·peak²")
      assert(flips < ns, "a flip needs a predecessor")
      assert(rms <= peak * 1000L, "RMS cannot exceed the peak")
      assert(rms * rms <= 1000000L * sumSq / ns + 2000L * rms, "rms_e3 consistent with Σs²/n")
    }
  }

  test("c6r_luma_hist: histogram partitions the pixels, stats bounded") {
    val rows = run("c6r_luma_hist").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (imgs, npx) = (r.getLong(1), r.getLong(2))
      val bins = (3 to 9).map(r.getLong)
      val (mean, contrast) = (r.getLong(10), r.getLong(11))
      assert(imgs > 0L && npx >= imgs)
      // ASCII payload: every byte >= 32 lands in bins 2..7, so the emitted
      // bins must partition the pixel count exactly
      assert(bins.sum == npx, s"histogram drops pixels: ${bins.sum} vs $npx")
      assert(bins.head == 0L, "bin 16..31 must be empty on printable ASCII")
      assert(mean >= 32000L && mean <= 127000L, s"mean_e3 $mean outside the ASCII band")
      assert(contrast > 0L && contrast <= 127L)
    }
  }

  test("b121_mann_kendall: pair-count identity, z/S sign agreement, trend thresholds") {
    val rows = run("b121_mann_kendall").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, np, s, z, trend) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(6))
      assert(np == d * (d - 1) / 2, "every ordered day pair exactly once")
      assert(math.abs(s) <= np, "|S| bounded by the pair count")
      assert(s == 0L && z == 0L || s != 0L && (z == 0L || (z > 0) == (s > 0)),
        "z sign must agree with S sign")
      val expected = if (z > 1960L) "up" else if (z < -1960L) "down" else "flat"
      assert(trend == expected, s"trend label inconsistent with z=$z")
    }
  }

  test("a11as_dbscan: clusters label by their min cell, counts consistent") {
    val rows = run("a11as_dbscan").collect()
    assert(rows.nonEmpty, "no core cells at sf0.001 — threshold too aggressive")
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    rows.foreach { r =>
      val (cells, pts) = (r.getLong(1), r.getLong(2))
      assert(cells >= 1L && pts >= cells, s"cluster ${r.getLong(0)}: $pts points over $cells cells")
    }
    // core-cell point total can never exceed the corpus point total
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.map(_.getLong(2)).sum <= events)
  }

  test("c4_viterbi_segment: optimal dominates greedy, identities hold") {
    val rows = run("c4_viterbi_segment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, inst, g, o, saved, fert) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(o <= g, "Viterbi must never emit more tokens than greedy")
      assert(saved == g - o, "saved_toks identity")
      assert(o >= inst, "every word instance is at least one token")
      assert(inst >= nw && nw > 0L)
      assert(fert == o * 1000000L / inst, "opt_fertility_e6 integer-quotient identity")
    }
  }

  test("b120_format_roundtrip: all three format fingerprints identical and non-trivial") {
    val rows = run("b120_format_roundtrip").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("csv", "json", "orc"))
    // losslessness is the whole claim: every format must report the SAME
    // (n_rows, sum_qty, sum_price_e2, n_orders) fingerprint, and it must
    // describe a non-empty table
    val fps = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).distinct
    assert(fps.length == 1, s"formats disagree: ${fps.mkString(", ")}")
    assert(fps.head._1 > 0L && fps.head._4 > 0L)
    assert(fps.head._1 >= fps.head._4, "row count below distinct order count")
  }

  test("b119_leadlag: r bounded, best dominates lag-0, ordered pairs complete") {
    val rows = run("b119_leadlag").collect()
    val types = rows.map(_.getString(0)).distinct.length
    assert(rows.length == types * (types - 1), "one row per ordered type pair")
    rows.foreach { r =>
      val (lag, rBest, r0) = (r.getLong(2), r.getLong(4), r.getLong(5))
      assert(lag >= -7L && lag <= 7L)
      // quantization: |r| can exceed 1e6 only by the floor's 1 ulp at r = ±1
      assert(math.abs(rBest) <= 1000001L && math.abs(r0) <= 1000001L)
      assert(rBest >= r0, "best-lag r must dominate the lag-0 r")
    }
    // symmetry of the lag-0 Pearson: r0(a,b) == r0(b,a)
    val r0map = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    r0map.foreach { case ((a, b), v) =>
      assert(r0map((b, a)) == v, s"lag-0 correlation not symmetric for ($a,$b)")
    }
  }
}

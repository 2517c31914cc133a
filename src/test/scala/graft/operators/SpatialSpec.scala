package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.Wkb

/** Grid-blocked point-in-polygon join semantics (SURVEY.md §2 A11d). */
class SpatialSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  private def square(x0: Double, y0: Double, x1: Double, y1: Double): Array[Byte] =
    Wkb.polygon(Seq(Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0))))

  test("pointInPolygonJoin: exact matches, multi-match, no duplicates, cross-cell polygons") {
    import spark.implicits._
    // polygons: two overlapping squares plus one far away; cell=10 means
    // the 25-wide square spans multiple cells (replication path)
    val polys = Seq(
      (1, square(0, 0, 25, 25)),     // spans cells (0..2)×(0..2)
      (2, square(20, 20, 30, 30)),   // overlaps poly 1 in [20,25]²
      (3, square(100, 100, 101, 101))
    ).toDF("poly_id", "wkb")
    val points = Seq(
      ("a", 5.0, 5.0),     // poly 1 only
      ("b", 22.0, 22.0),   // polys 1 and 2 (overlap region)
      ("c", 28.0, 28.0),   // poly 2 only
      ("d", 50.0, 50.0),   // none
      ("e", 100.5, 100.5)  // poly 3 (different grid neighborhood)
    ).toDF("point_id", "px", "py")
    val got = Spatial.pointInPolygonJoin(points, polys, cell = 10.0)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got.distinct.length == got.length, s"duplicate pairs emitted: $got")
    assert(got.toSet == Set(("a", 1), ("b", 1), ("b", 2), ("c", 2), ("e", 3)), got.toSet)
  }

  test("polygonJoin: exactly-once emission for pairs colliding in many cells") {
    import spark.implicits._
    // both squares span many cells (cell=5) and overlap across several of
    // them — the canonical-cell rule must still emit the pair exactly once
    val a = Seq((1, square(0, 0, 22, 22)), (2, square(100, 100, 110, 110)))
      .toDF("a_id", "a_wkb")
    val b = Seq(
      (10, square(10, 10, 40, 40)),   // overlaps a=1 over a 12x12 region
      (20, square(21, 0, 30, 5)),     // thin overlap with a=1's right edge
      (30, square(60, 60, 70, 70))    // disjoint from both
    ).toDF("b_id", "b_wkb")
    val got = Spatial.polygonJoin(a, b, cell = 5.0)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got.distinct.length == got.length, s"duplicate pairs: $got")
    assert(got.toSet == Set((1, 10), (1, 20)), got.toSet)
  }

  test("polygonJoin: containment pair (no boundary crossing) found once") {
    import spark.implicits._
    val a = Seq((1, square(0, 0, 40, 40))).toDF("a_id", "a_wkb")
    val b = Seq((2, square(10, 10, 12, 12))).toDF("b_id", "b_wkb")
    val got = Spatial.polygonJoin(a, b, cell = 8.0)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got == Seq((1, 2)), got)
  }

  test("nearestPolygonWithinR: containment wins, radius filters, ties break by id, cross-cell found, exactly-once") {
    import spark.implicits._
    val polys = Seq(
      (1, square(0, 0, 10, 10)),
      (2, square(20, 0, 30, 10)),
      (3, square(100, 100, 140, 140)) // spans many cells at cell=8
    ).toDF("poly_id", "wkb")
    val points = Seq(
      ("inside", 5.0, 5.0),      // contained in 1 → dist 0
      ("between", 14.0, 5.0),    // 4 from poly 1, 6 from poly 2 → nearest 1
      ("nearer2", 17.0, 5.0),    // 7 from 1, 3 from 2 → nearest 2
      ("tie", 15.0, 5.0),        // exactly 5 from both → lowest id wins
      ("far", 60.0, 60.0),       // nothing within r
      ("xcell", 95.0, 120.0)     // 5 left of poly 3, different cell than it
    ).toDF("point_id", "px", "py")
    val got = Spatial.nearestPolygonWithinR(points, polys, r = 6.0, cell = 8.0)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got("inside") == (1, 0.0), "contained point must report dist 0")
    assert(got("between") == (1, 4.0))
    assert(got("nearer2") == (2, 3.0))
    assert(got("tie") == (1, 5.0), "equidistant pair must break ties to the lowest id")
    assert(!got.contains("far"), "point with no polygon within r must be absent")
    assert(got("xcell") == (3, 5.0), "r-ball cell expansion missed a cross-cell polygon")
    assert(got.size == 5)
    // exactly-once even when the pair collides in many cells: one row per point
    val rows = Spatial.nearestPolygonWithinR(points, polys, r = 6.0, cell = 8.0).collect()
    assert(rows.map(_.getString(0)).toSeq.sorted ==
      rows.map(_.getString(0)).distinct.toSeq.sorted)
    // determinism across runs
    val again = Spatial.nearestPolygonWithinR(points, polys, r = 6.0, cell = 8.0)
      .collect().map(_.toString).sorted.toSeq
    assert(again == rows.map(_.toString).sorted.toSeq)
  }

  test("Wkb srid/setSrid: roundtrip, strip, body untouched, plain WKB reads 0") {
    val plain = square(1, 2, 3, 4)
    assert(Wkb.srid(plain) == 0)
    val tagged = Wkb.setSrid(plain, 4326)
    assert(Wkb.srid(tagged) == 4326)
    // body pass-through: same type, same bbox, same area
    assert(Wkb.geomType(tagged) == "POLYGON")
    assert(Wkb.bbox(tagged) == Wkb.bbox(plain))
    assert(Wkb.area(tagged) == Wkb.area(plain))
    // re-tag replaces, srid=0 strips back to the original bytes
    assert(Wkb.srid(Wkb.setSrid(tagged, 3857)) == 3857)
    assert(Wkb.setSrid(tagged, 0).sameElements(plain))
  }

  test("spatial joins fail loudly on mixed or cross-CRS SRIDs, pass on uniform") {
    import spark.implicits._
    val points = Seq(("a", 5.0, 5.0)).toDF("point_id", "px", "py")
    val mixed = Seq(
      (1, Wkb.setSrid(square(0, 0, 10, 10), 4326)),
      (2, Wkb.setSrid(square(0, 0, 10, 10), 3857))
    ).toDF("poly_id", "wkb")
    val e1 = intercept[Exception] {
      Spatial.pointInPolygonJoin(points, mixed, cell = 10.0).count()
    }
    assert(e1.getMessage.contains("mixes SRIDs"), e1.getMessage)
    // uniform non-zero SRID passes and still matches
    val uniform = Seq(
      (1, Wkb.setSrid(square(0, 0, 10, 10), 4326)),
      (2, Wkb.setSrid(square(100, 100, 110, 110), 4326))
    ).toDF("poly_id", "wkb")
    val ok = Spatial.pointInPolygonJoin(points, uniform, cell = 10.0)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(ok == Set(("a", 1)))
    // polygonJoin: each side uniform but in DIFFERENT CRSs also detonates
    val a = Seq((1, Wkb.setSrid(square(0, 0, 10, 10), 4326))).toDF("a_id", "a_wkb")
    val b = Seq((9, Wkb.setSrid(square(5, 5, 15, 15), 3857))).toDF("b_id", "b_wkb")
    val e2 = intercept[Exception] { Spatial.polygonJoin(a, b, cell = 10.0).count() }
    assert(e2.getMessage.contains("across CRSs"), e2.getMessage)
    // same CRS both sides: joins fine
    val b2 = Seq((9, Wkb.setSrid(square(5, 5, 15, 15), 4326))).toDF("b_id", "b_wkb")
    assert(Spatial.polygonJoin(a, b2, cell = 10.0).collect().toSeq.nonEmpty)
  }

  test("Wkb.reproject: 4326<->3857 roundtrip, known anchor, loud rejections") {
    // known anchor: lon 180 at the equator maps to the Mercator bound
    val g = Wkb.setSrid(Wkb.point(180.0, 0.0), 4326)
    val m = Wkb.reproject(g, 3857)
    assert(Wkb.srid(m) == 3857)
    val mb = Wkb.bbox(m)
    assert(math.abs(mb.xmin - 2.0037508342789244e7) < 1e-6, mb.toString)
    // tan(pi/4) is one ulp below 1 in doubles, so ln(tan(pi/4))*R is
    // ~-7e-10 m, not exactly 0 — assert at sub-micrometer tolerance
    assert(math.abs(mb.ymin) < 1e-6, s"equator must map to y~=0, got ${mb.ymin}")
    // polygon with a hole: structure survives, coords roundtrip to 1e-9°
    val poly = Wkb.setSrid(Wkb.polygon(Seq(
      Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)),
      Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)))), 4326)
    val rt = Wkb.reproject(Wkb.reproject(poly, 3857), 4326)
    assert(Wkb.geomType(rt) == "POLYGON")
    assert(Wkb.srid(rt) == 4326)
    assert(Wkb.ringVertexCounts(rt) == Wkb.ringVertexCounts(poly), "ring structure changed")
    val (b0, b1) = (Wkb.bbox(poly), Wkb.bbox(rt))
    assert(math.abs(b0.xmin - b1.xmin) < 1e-9 && math.abs(b0.ymax - b1.ymax) < 1e-9,
      s"roundtrip drift: $b0 vs $b1")
    // same-SRID reprojection is the byte-identical identity
    assert(Wkb.reproject(poly, 4326).sameElements(poly))
    // plain WKB (no SRID) and unsupported CRS pairs fail loudly
    // (27700 = OSGB36 National Grid: non-geocentric datum, needs a real
    // Helmert shift — permanently outside the registry's no-shift charter)
    intercept[IllegalArgumentException] { Wkb.reproject(Wkb.point(1, 2), 3857) }
    intercept[IllegalArgumentException] {
      Wkb.reproject(Wkb.setSrid(Wkb.point(1, 2), 27700), 4326)
    }
  }

  test("Crs registry LCC: exact origin anchors, hemispheres, roundtrip, EWKB path") {
    import graft.functions.Crs
    for (p <- Seq(Crs.Lambert93, Crs.CanadaLcc, Crs.EuropeLcc)) {
      // the grid origin (lon0, phi0) maps to (FE, FN) with zero residue:
      // θ = n·0 and ρ(φ0) is the SAME chain that defined ρ0
      val (e0, n0) = p.forward(p.lon0Deg, p.phi0Deg)
      assert(e0 == p.falseE && n0 == p.falseN, s"EPSG:${p.srid} origin ($e0, $n0)")
      // east of the central meridian → E > FE; north of φ0 → N > FN
      val (eE, _) = p.forward(p.lon0Deg + 1.0, p.phi0Deg)
      val (_, nN) = p.forward(p.lon0Deg, p.phi0Deg + 1.0)
      assert(eE > p.falseE && nN > p.falseN, s"EPSG:${p.srid} orientation")
      // 1 degree of meridian arc ≈ 111 km scaled by the cone's local
      // scale factor (k < 1 between the standard parallels — down to
      // ~0.966 for 3034's wide 35°/65° band) — gross-error detector on
      // the cone constants
      assert(math.abs((nN - p.falseN) - 111000.0) < 5000.0,
        s"EPSG:${p.srid} arc ${nN - p.falseN}")
      // fixed-8-iteration inverse: < 1e-9° across the grid's home range
      for (dLon <- Seq(-6.0, -2.0, 0.0, 0.7, 4.5); dLat <- Seq(-3.5, -1.0, 0.0, 2.0, 4.0)) {
        val (lon, lat) = (p.lon0Deg + dLon, p.phi0Deg + dLat)
        val (e, n) = p.forward(lon, lat)
        val (lo, la) = p.inverse(e, n)
        assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9,
          s"EPSG:${p.srid} roundtrip drift at ($lon, $lat): (${lo - lon}, ${la - lat})")
      }
    }
    // Lambert-93 sanity: metropolitan France lands in the published grid
    // envelope (E ~ 0.1-1.3 Mm, N ~ 6.0-7.2 Mm)
    val (pe, pn) = Crs.Lambert93.forward(2.35, 48.85) // Paris
    assert(pe > 100000 && pe < 1300000 && pn > 6000000 && pn < 7200000, s"($pe, $pn)")
    // EWKB path carries SRID 2154 and roundtrips through bytes
    val g = Wkb.setSrid(Wkb.point(2.35, 48.85), 4326)
    val l = Wkb.reproject(g, 2154)
    assert(Wkb.srid(l) == 2154)
    val back = Wkb.reproject(l, 4326)
    val bb = Wkb.bbox(back)
    assert(math.abs(bb.xmin - 2.35) < 1e-9 && math.abs(bb.ymin - 48.85) < 1e-9)
  }

  test("Crs registry Albers (5070): origin anchor, orientation, equal-area Jacobian, roundtrip, EWKB") {
    import graft.functions.Crs
    val p = Crs.ConusAlbers
    // the grid origin (lon0, phi0) maps to (FE, FN) with zero residue:
    // θ = n·0 and ρ(φ0) is the SAME chain that defined ρ0
    val (e0, n0) = p.forward(p.lon0Deg, p.phi0Deg)
    assert(e0 == p.falseE && n0 == p.falseN, s"origin ($e0, $n0)")
    val (eE, _) = p.forward(p.lon0Deg + 1.0, p.phi0Deg)
    val (_, nN) = p.forward(p.lon0Deg, p.phi0Deg + 1.0)
    assert(eE > p.falseE && nN > p.falseN, "orientation")
    assert(math.abs((nN - p.falseN) - 111000.0) < 5000.0, s"arc ${nN - p.falseN}")
    // THE defining property vs the conformal cone: the forward's Jacobian
    // determinant equals the ellipsoid area element M·N·cosφ (Snyder
    // ch. 14 — Albers preserves area everywhere, not just at the standard
    // parallels). Finite-difference the map at points spanning the CONUS
    // band and compare to 1e-4 relative.
    val a = 6378137.0; val e2 = p.e * p.e
    for ((lon, lat) <- Seq((-120.0, 32.0), (-96.0, 37.5), (-80.0, 29.5), (-104.0, 45.5), (-90.0, 48.0))) {
      val h = 1e-5
      val (x0, y0) = p.forward(lon, lat)
      val (xl, yl) = p.forward(lon + h, lat)
      val (xp, yp) = p.forward(lon, lat + h)
      val hr = h * math.Pi / 180.0
      val jac = ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (hr * hr)
      val s = math.sin(lat * math.Pi / 180.0)
      val w2 = 1.0 - e2 * s * s
      val bigM = a * (1.0 - e2) / (w2 * math.sqrt(w2))
      val bigN = a / math.sqrt(w2)
      val areaEl = bigM * bigN * math.cos(lat * math.Pi / 180.0)
      assert(math.abs(jac - areaEl) / areaEl < 1e-4,
        s"area distortion at ($lon, $lat): jac=$jac vs $areaEl")
    }
    // fixed-8-iteration Newton inverse: < 1e-9° across the CONUS band
    for (dLon <- Seq(-24.0, -8.0, 0.0, 6.5, 20.0); dLat <- Seq(3.0, 8.0, 14.5, 22.0, 25.0)) {
      val (lon, lat) = (p.lon0Deg + dLon, p.phi0Deg + dLat)
      val (e, n) = p.forward(lon, lat)
      val (lo, la) = p.inverse(e, n)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9,
        s"roundtrip drift at ($lon, $lat): (${lo - lon}, ${la - lat})")
    }
    // CONUS sanity: Denver lands in the published grid envelope
    val (de, dn) = p.forward(-104.99, 39.74)
    assert(de > -1200000 && de < -600000 && dn > 1500000 && dn < 2200000, s"($de, $dn)")
    // EWKB path carries SRID 5070 and roundtrips through bytes
    val g = Wkb.setSrid(Wkb.point(-104.99, 39.74), 4326)
    val ab = Wkb.reproject(g, 5070)
    assert(Wkb.srid(ab) == 5070)
    val bb = Wkb.bbox(Wkb.reproject(ab, 4326))
    assert(math.abs(bb.xmin - -104.99) < 1e-9 && math.abs(bb.ymin - 39.74) < 1e-9)
  }

  test("Crs custom registration: arbitrary-parameter grids, shadowing rejected, EWKB dispatch") {
    import graft.functions.Crs
    try {
      // TM35FIN and CS92 ship as built-ins now — pin their anchors
      val fin = Crs.tm(3067)
      val (fe, _) = fin.forward(27.0, 0.0)
      assert(fe == 500000.0)
      val (lo, la) = fin.inverse(fin.forward(25.5, 62.3)._1, fin.forward(25.5, 62.3)._2)
      assert(math.abs(lo - 25.5) < 1e-9 && math.abs(la - 62.3) < 1e-9)
      // custom LCC: a Texas-Central-like 2-SP grid under a private code
      val tx = Crs.registerLcc(909101, 30.1166, 31.8833, 29.6666, -100.3333,
        700000.0, 3000000.0)
      val (e0, n0) = tx.forward(tx.lon0Deg, tx.phi0Deg)
      assert(e0 == 700000.0 && n0 == 3000000.0)
      // the registry dispatch (and therefore Wkb.reproject/EWKB) sees it
      assert(Crs.forwardOf(909101).isDefined && Crs.inverseOf(909101).isDefined)
      val g = Wkb.reproject(Wkb.setSrid(Wkb.point(-98.5, 30.3), 4326), 909101)
      assert(Wkb.srid(g) == 909101)
      val bb = Wkb.bbox(Wkb.reproject(g, 4326))
      assert(math.abs(bb.xmin - -98.5) < 1e-9 && math.abs(bb.ymin - 30.3) < 1e-9)
      // custom TM with a non-default k0, roundtrip
      val t = Crs.registerTm(909102, 0.99987, 3.0, 200000.0, -100000.0)
      val (e1, n1) = t.forward(4.2, 51.5)
      val (lo2, la2) = t.inverse(e1, n1)
      assert(math.abs(lo2 - 4.2) < 1e-9 && math.abs(la2 - 51.5) < 1e-9)
      // shadowing a shipped code is rejected loudly; so is double-registering
      intercept[IllegalArgumentException] {
        Crs.registerTm(3067, 1.0, 27.0, 0.0, 0.0)
      }
      intercept[IllegalArgumentException] {
        Crs.registerLcc(909101, 30.0, 32.0, 29.0, -100.0, 0.0, 0.0)
      }
      // unregister really removes the dispatch
      Crs.unregister(909102)
      assert(Crs.forwardOf(909102).isEmpty)
      intercept[IllegalArgumentException] {
        Wkb.reproject(Wkb.setSrid(Wkb.point(1, 2), 4326), 909102)
      }
    } finally { Crs.unregister(909101); Crs.unregister(909102) }
  }

  test("Crs registry LAEA (3035): origin anchor, equal-area Jacobian, roundtrip, EWKB") {
    import graft.functions.Crs
    val p = Crs.EuropeLaea
    // the projection center maps to (FE, FN): λ=0 ⇒ sl=0 and
    // cosβ0·sinβ0 − sinβ0·cosβ0 = 0 exactly
    val (e0, n0) = p.forward(p.lon0Deg, p.phi0Deg)
    assert(math.abs(e0 - p.falseE) < 1e-6 && math.abs(n0 - p.falseN) < 1e-6, s"($e0, $n0)")
    // equal-area Jacobian — same ellipsoid-area-element check as the
    // Albers sibling, across the European window
    val a = 6378137.0; val e2 = p.e * p.e
    for ((lon, lat) <- Seq((-9.0, 38.7), (10.0, 52.0), (25.0, 60.1), (14.5, 41.0))) {
      val h = 1e-5
      val (x0, y0) = p.forward(lon, lat)
      val (xl, yl) = p.forward(lon + h, lat)
      val (xp, yp) = p.forward(lon, lat + h)
      val hr = h * math.Pi / 180.0
      val jac = ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (hr * hr)
      val s = math.sin(lat * math.Pi / 180.0)
      val w2 = 1.0 - e2 * s * s
      val areaEl = (a * (1.0 - e2) / (w2 * math.sqrt(w2))) * (a / math.sqrt(w2)) *
        math.cos(lat * math.Pi / 180.0)
      assert(math.abs(jac - areaEl) / areaEl < 1e-4,
        s"area distortion at ($lon, $lat): jac=$jac vs $areaEl")
    }
    // fixed-8-iteration Newton inverse: < 1e-9° across the grid window
    for (dLon <- Seq(-18.0, -6.0, 0.0, 8.0, 20.0); dLat <- Seq(-16.0, -5.0, 0.0, 6.0, 12.0)) {
      val (lon, lat) = (p.lon0Deg + dLon, p.phi0Deg + dLat)
      val (e, n) = p.forward(lon, lat)
      val (lo, la) = p.inverse(e, n)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9,
        s"roundtrip drift at ($lon, $lat): (${lo - lon}, ${la - lat})")
    }
    // published-grid sanity: Paris lands inside the EEA reference grid
    // envelope (E ~ 3.0-4.5 Mm, N ~ 2.5-3.5 Mm for western Europe)
    val (pe, pn) = p.forward(2.35, 48.85)
    assert(pe > 3000000 && pe < 4500000 && pn > 2500000 && pn < 3500000, s"($pe, $pn)")
    // EWKB path carries SRID 3035 and roundtrips through bytes
    val g = Wkb.setSrid(Wkb.point(2.35, 48.85), 4326)
    val l = Wkb.reproject(g, 3035)
    assert(Wkb.srid(l) == 3035)
    val bb = Wkb.bbox(Wkb.reproject(l, 4326))
    assert(math.abs(bb.xmin - 2.35) < 1e-9 && math.abs(bb.ymin - 48.85) < 1e-9)
  }

  test("Crs registry TM (ETRS89 UTM): anchors, agreement with WGS84 UTM, roundtrip") {
    import graft.functions.Crs
    val z32 = Crs.tm(25832)
    // central meridian × equator anchors exactly, like the WGS84 twin
    val (e0, n0) = z32.forward(9.0, 0.0)
    assert(e0 == 500000.0 && n0 == 0.0, s"($e0, $n0)")
    // GRS80 vs WGS84 differ only in the 12th digit of f — the grids agree
    // to sub-millimeter (the reason the zero-shift stance is sound)
    for ((lon, lat) <- Seq((9.0, 45.0), (6.3, 70.0), (11.7, 37.5))) {
      val (eG, nG) = z32.forward(lon, lat)
      val (eW, nW) = Wkb.lonLatToUtm(lon, lat, 32, south = false)
      assert(math.abs(eG - eW) < 1e-3 && math.abs(nG - nW) < 1e-3,
        s"ETRS/WGS disagree at ($lon, $lat): (${eG - eW}, ${nG - nW})")
    }
    // roundtrip across all registered zones
    for (srid <- 25828 to 25838; lat <- Seq(36.0, 52.0, 68.0)) {
      val p = Crs.tm(srid)
      val (e, n) = p.forward(p.lon0Deg + 2.1, lat)
      val (lo, la) = p.inverse(e, n)
      assert(math.abs(lo - (p.lon0Deg + 2.1)) < 1e-9 && math.abs(la - lat) < 1e-9,
        s"EPSG:$srid roundtrip drift")
    }
    // EWKB dispatch
    val u = Wkb.reproject(Wkb.setSrid(Wkb.point(10.0, 50.0), 4326), 25832)
    assert(Wkb.srid(u) == 25832)
    assert(math.abs(Wkb.bbox(Wkb.reproject(u, 4326)).xmin - 10.0) < 1e-9)
  }

  test("Crs registry polar stereo (3413/3031): pole anchor, ts-parallel scale, roundtrip, EWKB") {
    import graft.functions.Crs
    for (p <- Seq(Crs.NsidcNorth, Crs.Antarctic)) {
      // the pole itself maps to (FE, FN): t(90°) has tan(0) = 0 exactly
      val poleLat = if (p.south) -90.0 else 90.0
      val (pe, pn) = p.forward(p.lon0Deg, poleLat)
      assert(pe == p.falseE && pn == p.falseN, s"EPSG:${p.srid} pole ($pe, $pn)")
      // at the standard parallel, ρ ≈ a·cos(φts)·(scale ~1): distance from
      // the pole is within 0.7% of the spherical-cap chord a·m(φts) —
      // gross-error detector on the ρ-scale
      val ts = math.abs(p.phiTsDeg)
      val (e1, n1) = p.forward(p.lon0Deg + 90.0, if (p.south) -ts else ts)
      val rho = math.hypot(e1 - p.falseE, n1 - p.falseN)
      val expect = 6378137.0 * math.cos(ts * math.Pi / 180.0) /
        math.sqrt(1.0 - p.e * p.e * math.pow(math.sin(ts * math.Pi / 180.0), 2))
      assert(math.abs(rho - expect) / expect < 0.007, s"EPSG:${p.srid} rho $rho vs $expect")
      // fixed-8-iteration inverse: < 1e-9° at world-range longitudes (the
      // inverse normalizes into (−180, 180], so the far hemisphere of an
      // off-center grid like 3413's −45° roundtrips too)
      for (lon <- Seq(-170.0, -60.0, 0.0, 45.0, 179.0); lat <- Seq(58.0, 70.0, 84.0, 89.5)) {
        val signed = if (p.south) -lat else lat
        val (e, n) = p.forward(lon, signed)
        val (lo, la) = p.inverse(e, n)
        assert(math.abs(lo - lon) < 1e-9 && math.abs(la - signed) < 1e-9,
          s"EPSG:${p.srid} roundtrip drift at ($lon, $signed)")
      }
    }
    // published-envelope sanity: central Greenland lands in 3413's home box
    val (ge, gn) = Crs.NsidcNorth.forward(-42.0, 72.0)
    assert(math.hypot(ge, gn) < 2.6e6, s"($ge, $gn)")
    // EWKB dispatch both ways
    val g = Wkb.reproject(Wkb.setSrid(Wkb.point(-42.0, 72.0), 4326), 3413)
    assert(Wkb.srid(g) == 3413)
    val bb = Wkb.bbox(Wkb.reproject(g, 4326))
    assert(math.abs(bb.xmin - -42.0) < 1e-9 && math.abs(bb.ymin - 72.0) < 1e-9)
  }

  test("Crs registry sinusoidal (53008): equator/meridian anchors, equal-area grid, roundtrip") {
    import graft.functions.Crs
    val p = Crs.SphereSinusoidal
    // the central meridian maps to x=0 with y = R·φ exactly; the equator
    // to y=0 with x = R·λ exactly (cos 0 = 1)
    val (x0, y0) = p.forward(0.0, 47.0)
    assert(x0 == 0.0 && y0 == p.radius * (47.0 * math.Pi / 180.0), s"($x0, $y0)")
    val (xe, ye) = p.forward(31.0, 0.0)
    assert(ye == 0.0 && xe == p.radius * (31.0 * math.Pi / 180.0), s"($xe, $ye)")
    // meridians converge by cos(φ): x at 60°N is exactly half x at 0°N
    val (x60, _) = p.forward(31.0, 60.0)
    assert(math.abs(x60 / xe - math.cos(60.0 * math.Pi / 180.0)) < 1e-12)
    // closed-form inverse: exact roundtrip off the poles
    for (lon <- Seq(-179.0, -30.5, 0.0, 88.25, 179.9); lat <- Seq(-80.0, -7.5, 0.0, 45.0, 80.0)) {
      val (x, y) = p.forward(lon, lat)
      val (lo, la) = p.inverse(x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"drift at ($lon, $lat)")
    }
    // EWKB dispatch
    val u = Wkb.reproject(Wkb.setSrid(Wkb.point(10.0, 50.0), 4326), 53008)
    assert(Wkb.srid(u) == 53008)
    assert(math.abs(Wkb.bbox(Wkb.reproject(u, 4326)).xmin - 10.0) < 1e-9)
  }

  test("Wkb UTM reproject: exact anchors, series sanity, roundtrip, loud rejections") {
    // central meridian × equator is EXACT (every series term carries a
    // sin/sinh of an exact 0)
    val (e0, n0) = Wkb.lonLatToUtm(9.0, 0.0, 32, south = false)
    assert(e0 == 500000.0 && n0 == 0.0, s"($e0, $n0)")
    val (_, nS) = Wkb.lonLatToUtm(9.0, 0.0, 32, south = true)
    assert(nS == 10000000.0)
    // 1 degree of meridian arc from the equator is ~110574.3 m (geodesy
    // constant); northing = k0 × arc — a gross-error detector on the series
    val (_, n1) = Wkb.lonLatToUtm(9.0, 1.0, 32, south = false)
    assert(math.abs(n1 - 0.9996 * 110574.3) < 30.0, n1.toString)
    // 3 degrees along the equator: a·(3°) ≈ 333958 m; easting offset is
    // k0 × that plus the (small, positive) TM divergence
    val (e3, _) = Wkb.lonLatToUtm(12.0, 0.0, 32, south = false)
    assert(math.abs((e3 - 500000.0) - 333958.4 * 0.9996) < 600.0, e3.toString)
    // mirror symmetry about the central meridian
    val (eW, nW) = Wkb.lonLatToUtm(7.5, 45.0, 32, south = false)
    val (eE, nE) = Wkb.lonLatToUtm(10.5, 45.0, 32, south = false)
    assert(math.abs((eE - 500000.0) + (eW - 500000.0)) < 1e-6, s"$eW vs $eE")
    assert(math.abs(nE - nW) < 1e-6)
    // forward∘inverse < 1e-9° across the zone (and beyond its 6° width)
    for (lon <- Seq(6.1, 8.0, 9.0, 10.9, 11.9);
         lat <- Seq(-80.0, -45.0, -1.0, 0.0, 0.5, 37.0, 72.0, 84.0)) {
      val (e, n) = Wkb.lonLatToUtm(lon, lat, 32, south = false)
      val (lo, la) = Wkb.utmToLonLat(e, n, 32, south = false)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9,
        s"roundtrip drift at ($lon, $lat): (${lo - lon}, ${la - lat})")
    }
    // EWKB path carries the UTM SRID and roundtrips through bytes
    val g = Wkb.setSrid(Wkb.point(10.0, 50.0), 4326)
    val u = Wkb.reproject(g, 32632)
    assert(Wkb.srid(u) == 32632)
    val bb = Wkb.bbox(Wkb.reproject(u, 4326))
    assert(math.abs(bb.xmin - 10.0) < 1e-9 && math.abs(bb.ymin - 50.0) < 1e-9)
    assert(Wkb.srid(Wkb.reproject(g, 32732)) == 32732, "south zone srid")
    // invalid zone, cross-datum grid, and 3857<->UTM all reject loudly
    // (25832 moved from "rejected" to the Crs registry in r13 — the
    // rejection pin now uses a zone outside the registered 28-38 band)
    intercept[IllegalArgumentException] { Wkb.reproject(g, 32661) }
    intercept[IllegalArgumentException] { Wkb.reproject(g, 25801) }
    intercept[IllegalArgumentException] {
      Wkb.reproject(Wkb.setSrid(Wkb.point(1, 2), 3857), 32632)
    }
  }

  test("Wkb.geodesicDirect + bufferGeodesicPoint: direct/inverse closure, anchors, ring shape") {
    // Vincenty's own published test line, run FORWARD: from Flinders
    // Peak at the published azimuth/distance, the direct solution must
    // land on Buninyong to sub-mm (306°52'05.37" = 306.868158333...°)
    val (bLon, bLat) = Wkb.geodesicDirect(144.42486789, -37.95103342,
      306.0 + 52.0 / 60.0 + 5.37 / 3600.0, 54972.271)
    assert(math.abs(bLon - 143.92649553) < 1e-7 && math.abs(bLat - -37.65282114) < 1e-7,
      s"($bLon, $bLat)")
    // equator east: the geodesic is the equator arc, lat stays 0 exactly-ish
    val (eqLon, eqLat) = Wkb.geodesicDirect(10.0, 0.0, 90.0, 6378137.0 * math.Pi / 180.0)
    assert(math.abs(eqLon - 11.0) < 1e-8 && math.abs(eqLat) < 1e-9, s"($eqLon, $eqLat)")
    // direct∘inverse closure: place a point r meters out at many
    // azimuths/latitudes, measure it back with the INDEPENDENT inverse
    // iteration — sub-mm closure everywhere in the band
    for (lat <- Seq(-59.0, -20.0, 0.0, 33.3, 58.0); az <- Seq(0.0, 67.5, 180.0, 292.5);
         r <- Seq(500.0, 25000.0)) {
      val (vx, vy) = Wkb.geodesicDirect(5.0, lat, az, r)
      assert(math.abs(Wkb.geodesicMeters(5.0, lat, vx, vy) - r) < 1e-3,
        s"closure at lat=$lat az=$az r=$r")
    }
    // buffer ring: 16 vertices + closure, all meter-true, and the ring
    // straddles the center in both axes
    val ring = Wkb.outerRing(Wkb.bufferGeodesicPoint(Wkb.point(-104.99, 39.74), 500.0, 16))
    assert(ring.length == 17 && ring.head == ring.last)
    val open = ring.dropRight(1)
    assert(open.forall { case (vx, vy) =>
      math.abs(Wkb.geodesicMeters(-104.99, 39.74, vx, vy) - 500.0) < 1e-3 })
    assert(open.exists(_._1 < -104.99) && open.exists(_._1 > -104.99))
    assert(open.exists(_._2 < 39.74) && open.exists(_._2 > 39.74))
    // k=0 is due north: same longitude (to fp noise), lat + ~500/110852 deg
    val north = open.head
    assert(math.abs(north._1 - -104.99) < 1e-12 && north._2 > 39.74)
    // non-point input rejected loudly
    intercept[IllegalArgumentException] {
      Wkb.bufferGeodesicPoint(Wkb.lineString(Seq((0.0, 0.0), (1.0, 1.0))), 500.0)
    }
    intercept[IllegalArgumentException] { Wkb.bufferGeodesicPoint(Wkb.point(0, 0), 500.0, 2) }
  }

  test("Wkb.geodesicMeters: known anchors, symmetry, planar agreement at small separations") {
    // Vincenty's own published test line (Flinders Peak → Buninyong,
    // Survey Review 1975): s = 54972.271 m. Six fixed iterations land
    // well inside a millimeter of the converged value.
    val d = Wkb.geodesicMeters(144.42486789, -37.95103342, 143.92649553, -37.65282114)
    assert(math.abs(d - 54972.271) < 1e-2, d.toString)
    // along the equator the geodesic IS the equator arc: a · Δλ
    val eq = Wkb.geodesicMeters(0.0, 0.0, 1.0, 0.0)
    assert(math.abs(eq - 6378137.0 * math.Pi / 180.0) < 1e-3, eq.toString)
    // one degree of meridian at the equator ≈ 110574.3 m (geodesy constant)
    val mer = Wkb.geodesicMeters(0.0, 0.0, 0.0, 1.0)
    assert(math.abs(mer - 110574.3) < 1.0, mer.toString)
    // coincident points: exactly zero (the sinσ == 0 branch)
    assert(Wkb.geodesicMeters(12.5, 48.25, 12.5, 48.25) == 0.0)
    // symmetry — to the last ulp only: reversing the points swaps operand
    // order inside the products, so the results differ by ≤1 ulp
    val fwd = Wkb.geodesicMeters(10, 50, 11, 51)
    val rev = Wkb.geodesicMeters(11, 51, 10, 50)
    assert(math.abs(fwd - rev) <= 4 * math.ulp(fwd), s"$fwd vs $rev")
    // small-separation property: for ~100 m separations the ellipsoid is
    // locally flat, so geodesic ≈ planar with per-axis metric scaling
    // (M(φ) meridian radius, N(φ)cosφ parallel radius) to within 0.1%
    val f = 1.0 / 298.257223563
    val e2 = f * (2 - f)
    for (lat <- Seq(-70.0, -33.3, 0.0, 12.0, 45.0, 68.9); lon <- Seq(-179.5, 0.0, 77.7)) {
      val phi = math.toRadians(lat)
      val s2 = math.sin(phi) * math.sin(phi)
      val nRad = 6378137.0 / math.sqrt(1 - e2 * s2)
      val mRad = 6378137.0 * (1 - e2) / math.pow(1 - e2 * s2, 1.5)
      val dLon = 0.001; val dLat = 0.0007
      val dx = math.toRadians(dLon) * nRad * math.cos(phi)
      val dy = math.toRadians(dLat) * mRad
      val planar = math.sqrt(dx * dx + dy * dy)
      val geo = Wkb.geodesicMeters(lon, lat, lon + dLon, lat + dLat)
      assert(math.abs(geo - planar) / planar < 1e-3,
        s"at ($lon, $lat): geodesic $geo vs planar $planar")
    }
    // WKB surface parses POINTs and rejects non-points
    val gd = Wkb.geodesicDistance(Wkb.point(0, 0), Wkb.point(1, 0))
    assert(gd == eq)
    intercept[IllegalArgumentException] {
      Wkb.geodesicDistance(Wkb.lineString(Seq((0.0, 0.0), (1.0, 1.0))), Wkb.point(0, 0))
    }
  }

  test("Wkb.geodesicMeters: antipodal guard — accurate or loud, never silently wrong") {
    // convergent-domain sweep: pairs up to ~170° separation. For every
    // pair the fixed-round value must agree with the to-convergence value
    // within 1 mm, OR the guard must have thrown — no third outcome.
    val pts = for (lon <- Seq(-150.0, -60.0, 0.0, 45.0, 120.0, 170.0);
                   lat <- Seq(-75.0, -30.0, 0.0, 15.0, 60.0)) yield (lon, lat)
    var checked = 0
    for ((lon1, lat1) <- pts; (lon2, lat2) <- pts if (lon1, lat1) != (lon2, lat2)) {
      val robust =
        try Some(Wkb.geodesicMetersRobust(lon1, lat1, lon2, lat2, maxIters = 1000))
        catch { case _: IllegalArgumentException => None }
      try {
        val fixd = Wkb.geodesicMeters(lon1, lat1, lon2, lat2)
        assert(robust.isDefined && math.abs(fixd - robust.get) < 1e-3,
          s"fixed-round value $fixd vs converged $robust at ($lon1,$lat1)-($lon2,$lat2)")
        checked += 1
      } catch { case _: IllegalArgumentException => () } // loud, acceptable
    }
    // the guard must not be trivially rejecting everything
    assert(checked > pts.size * pts.size / 2,
      s"only $checked pairs passed the fixed-round path — guard too aggressive")
    // large-separation anchor: on the equator the geodesic IS the equator
    // arc up to the ~179.4° critical azimuth, so robust at 179° has a
    // closed-form reference: a · Δλ
    val eq179 = Wkb.geodesicMetersRobust(0.0, 0.0, 179.0, 0.0)
    assert(math.abs(eq179 - 6378137.0 * math.toRadians(179.0)) < 1e-3, eq179.toString)
    // near-antipodal: the fixed-round path throws LOUDLY (λ still moving),
    // instead of the old silently-inaccurate return
    intercept[IllegalArgumentException] {
      Wkb.geodesicMeters(0.0, 30.0, 179.9, -30.05)
    }
    // robust on the same pair: either converges to a sane near-max
    // geodesic or throws — never returns garbage
    try {
      val d = Wkb.geodesicMetersRobust(0.0, 30.0, 179.9, -30.05)
      assert(d > 1.9e7 && d < 2.01e7, d.toString)
    } catch { case _: IllegalArgumentException => () }
    // exactly antipodal on the equator: outside Vincenty's domain — both
    // paths must refuse
    intercept[IllegalArgumentException] { Wkb.geodesicMeters(0.0, 0.0, 180.0, 0.0) }
    intercept[IllegalArgumentException] { Wkb.geodesicMetersRobust(0.0, 0.0, 180.0, 0.0) }
  }

  test("Wkb distance: pointDistance exact chain, boundaryDistance edge cases") {
    val d = Wkb.pointDistance(Wkb.point(1.0, 2.0), Wkb.point(4.0, 6.0))
    assert(d == 5.0)
    val sq = square(0, 0, 10, 10)
    assert(Wkb.boundaryDistance(sq, 5.0, 5.0) == 5.0, "interior: distance to nearest edge")
    assert(Wkb.boundaryDistance(sq, 5.0, 0.0) == 0.0, "on the boundary")
    assert(Wkb.boundaryDistance(sq, 5.0, -3.0) == 3.0, "outside, facing an edge")
    assert(Wkb.boundaryDistance(sq, 13.0, 14.0) == 5.0, "outside, past a corner (3-4-5)")
    // a hole edge is boundary too
    val holed = Wkb.polygon(Seq(
      Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)),
      Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0))))
    assert(Wkb.boundaryDistance(holed, 5.0, 5.0) == 1.0, "hole edge must count as boundary")
    intercept[IllegalArgumentException](
      Wkb.pointDistance(sq, Wkb.point(0.0, 0.0)))
  }

  test("GeoSql: geom_* functions callable from SQL") {
    import spark.implicits._
    graft.functions.GeoSql.register(spark)
    Seq((1, square(0, 0, 10, 10)), (2, square(20, 20, 22, 22)))
      .toDF("id", "wkb").createOrReplaceTempView("geoms")
    val r = spark.sql("""
      SELECT id, geom_type(wkb) AS t, geom_area(wkb) AS a,
             geom_contains_point(wkb, 5.0, 5.0) AS has5,
             geom_bbox_xmax(wkb) AS xmax
      FROM geoms ORDER BY id""").collect()
    assert(r(0).getString(1) == "POLYGON" && r(0).getDouble(2) == 100.0)
    assert(r(0).getBoolean(3) && !r(1).getBoolean(3))
    assert(r(1).getDouble(4) == 22.0)
    val isect = spark.sql("""
      SELECT geom_intersects(a.wkb, b.wkb) FROM geoms a JOIN geoms b
      ON a.id = 1 AND b.id = 2""").collect().head.getBoolean(0)
    assert(!isect)
    // geom_make_valid: a CW square comes back CCW with the same area
    val cw = Wkb.polygon(Seq(Seq((0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0))))
    Seq((1, cw)).toDF("id", "wkb").createOrReplaceTempView("badgeom")
    val fixed = spark.sql(
      "SELECT geom_area(geom_make_valid(wkb)) AS a FROM badgeom").collect().head.getDouble(0)
    assert(fixed == 16.0)
    // boolean overlay family from SQL: pieces explode as array<binary>
    val ov = Seq((square(0.0, 0.0, 4.0, 4.0), square(2.0, 1.0, 6.0, 3.0)))
      .toDF("a", "b").createOrReplaceTempView("ovg")
    val ovRow = spark.sql("""
      SELECT geom_area(geom_union(a, b)) AS ua,
             aggregate(transform(geom_intersection(a, b), p -> geom_area(p)),
               0.0D, (acc, x) -> acc + x) AS ia,
             aggregate(transform(geom_difference(a, b), p -> geom_area(p)),
               0.0D, (acc, x) -> acc + x) AS da,
             size(geom_sym_difference(a, b)) AS sn
      FROM ovg""").collect().head
    assert(ovRow.getDouble(0) == 16.0 + 8.0 - 4.0, ovRow.toString) // union
    assert(ovRow.getDouble(1) == 4.0 && ovRow.getDouble(2) == 12.0)
    assert(ovRow.getInt(3) == 2) // A\B and B\A, one piece each
    spark.catalog.dropTempView("ovg")
    spark.catalog.dropTempView("badgeom")
    spark.catalog.dropTempView("geoms")
  }

  test("pointInPolygonJoin: holes excluded, negative-coordinate cells correct") {
    import spark.implicits._
    val holed = Wkb.polygon(Seq(
      Seq((-20.0, -20.0), (0.0, -20.0), (0.0, 0.0), (-20.0, 0.0), (-20.0, -20.0)),
      Seq((-12.0, -12.0), (-8.0, -12.0), (-8.0, -8.0), (-12.0, -8.0), (-12.0, -12.0))))
    val polys = Seq((7, holed)).toDF("poly_id", "wkb")
    val points = Seq(
      ("in_ring", -15.0, -15.0),
      ("in_hole", -10.0, -10.0),
      ("outside", 5.0, -10.0)
    ).toDF("point_id", "px", "py")
    val got = Spatial.pointInPolygonJoin(points, polys, cell = 10.0)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == Set(("in_ring", 7)), got)
  }

  /** Bit-by-bit reference interleave for the Morton column. */
  private def mortonRef(qx: Long, qy: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((qx >> i) & 1L) << (2 * i)) | (((qy >> i) & 1L) << (2 * i + 1))
    }

  test("mortonCol matches the bit-by-bit reference interleave") {
    import spark.implicits._
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (255L, 256L), (43690L, 21845L))
    val got = cases.toDF("qx", "qy")
      .select(Spatial.mortonCol($"qx", $"qy")).as[Long].collect()
    assert(got.sameElements(cases.map { case (x, y) => mortonRef(x, y) }))
  }

  test("mortonDecode inverts the interleave over the full 16-bit corner/edge/random set") {
    val vals = Seq(0L, 1L, 2L, 255L, 256L, 32767L, 32768L, 65535L) ++
      (0 until 200).map(i => (i * 2654435761L) % 65536L)
    for (x <- vals.take(30); y <- vals.take(30)) {
      val k = mortonRef(x, y)
      assert(Spatial.mortonDecode(k) == ((x, y)), s"x=$x y=$y")
    }
  }

  test("morton prefix property: an aligned 256x256 tile is one contiguous key range") {
    import spark.implicits._
    // all points of the tile [256,511]x[512,767] share the same level-8
    // tile prefix, and their keys fill exactly [prefix<<16, (prefix+1)<<16)
    val pts = for { x <- 256L to 511L by 51; y <- 512L to 767L by 51 } yield (x, y)
    val keys = pts.toDF("qx", "qy")
      .select(Spatial.mortonCol($"qx", $"qy")).as[Long].collect()
    val prefix = mortonRef(256L >> 8, 512L >> 8)
    assert(keys.forall(k => (k >> 16) == prefix), "shared tile prefix")
    // a point outside the tile never lands in the range
    val out = Seq((255L, 512L), (256L, 768L), (0L, 0L)).toDF("qx", "qy")
      .select(Spatial.mortonCol($"qx", $"qy")).as[Long].collect()
    assert(out.forall(k => (k >> 16) != prefix))
  }

  test("hilbertCol codegen matches the driver reference walk; d2xy inverts it") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.HilbertIndex
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (65535L, 65535L),
      (65535L, 0L), (0L, 65535L), (12345L, 54321L), (32768L, 32767L)) ++
      (0 until 50).map(i => ((i * 2654435761L) % 65536L, (i * 40503L) % 65536L))
    val got = cases.toDF("qx", "qy")
      .select(Spatial.hilbertCol($"qx", $"qy")).as[Long].collect()
    assert(got.sameElements(cases.map { case (x, y) => HilbertIndex.xy2d(x, y) }))
    cases.foreach { case (x, y) =>
      assert(Spatial.hilbertDecode(HilbertIndex.xy2d(x, y)) == ((x, y)), s"x=$x y=$y")
    }
    // corners of the full grid: curve starts at (0,0) and ends at (65535,0)
    assert(HilbertIndex.xy2d(0L, 0L) == 0L)
    assert(HilbertIndex.xy2d(65535L, 0L) == (1L << 32) - 1L)
  }

  test("hilbert unit-step locality: consecutive keys are 4-adjacent cells; Morton is not") {
    import org.apache.spark.sql.graftbridge.HilbertIndex
    // walk 4096 consecutive curve positions from a few scattered offsets:
    // every step moves to a Manhattan-distance-1 cell (the property that
    // makes bbox → few long key ranges); Morton's row-major scan violates
    // it at every 2^k boundary.
    for (base <- Seq(0L, 1234567L, (1L << 31) + 9999L)) {
      var (px, py) = HilbertIndex.d2xy(base)
      (1L to 4096L).foreach { i =>
        val (x, y) = HilbertIndex.d2xy(base + i)
        assert(math.abs(x - px) + math.abs(y - py) == 1L,
          s"non-adjacent step at d=${base + i}")
        px = x; py = y
      }
    }
    // bijectivity on a 64×64 subgrid (distinct keys = no cell aliasing)
    val keys = for (x <- 0L until 64L; y <- 0L until 64L)
      yield HilbertIndex.xy2d(x, y)
    assert(keys.distinct.size == 64 * 64)
  }

  test("hilbert bbox fragmentation: fewer contiguous key ranges than Morton on unaligned bboxes") {
    import org.apache.spark.sql.graftbridge.HilbertIndex
    // The scale claim behind a11ab: a bbox filter on a key-range-partitioned
    // layout costs one seek per CONTIGUOUS key range the bbox decomposes
    // into. Count ranges = sorted cell keys with gaps, for both curves, on
    // unaligned bboxes (power-of-two-aligned ones are Morton's best case).
    def ranges(keys: Seq[Long]): Int = {
      val s = keys.sorted
      1 + s.zip(s.tail).count { case (a, b) => b != a + 1 }
    }
    def mortonRef2(x: Long, y: Long): Long = {
      var k = 0L
      (0 until 16).foreach { b =>
        k |= ((x >> b) & 1L) << (2 * b)
        k |= ((y >> b) & 1L) << (2 * b + 1)
      }
      k
    }
    val bboxes = Seq((100L, 200L, 48L), (1000L, 3000L, 96L), (30000L, 40000L, 64L),
      (511L, 511L, 33L), (65000L, 100L, 50L))
    var hTot = 0
    var mTot = 0
    bboxes.foreach { case (x0, y0, w) =>
      val cells = for (x <- x0 until (x0 + w); y <- y0 until (y0 + w)) yield (x, y)
      val h = ranges(cells.map { case (x, y) => HilbertIndex.xy2d(x, y) })
      val m = ranges(cells.map { case (x, y) => mortonRef2(x, y) })
      hTot += h; mTot += m
    }
    assert(hTot < mTot, s"hilbert ranges $hTot should beat morton $mTot")
  }

  test("geohash: known value, prefix-cell property, decode inverts encode") {
    import spark.implicits._
    // the textbook example: (lat 42.605, lon -5.603) lives in cell ezs42
    val gh = Seq((-5.603, 42.605)).toDF("lon", "lat")
      .select(Spatial.geohashCol($"lon", $"lat").as("gh"))
      .head().getString(0)
    assert(gh.startsWith("ezs42"), s"expected ezs42*, got $gh")
    // prefix property: nearby points share the coarse prefix
    val gh2 = Seq((-5.6031, 42.6051)).toDF("lon", "lat")
      .select(Spatial.geohashCol($"lon", $"lat").as("gh"))
      .head().getString(0)
    assert(gh.take(5) == gh2.take(5))
    // decode returns a cell bbox containing the encoded point, and
    // re-encoding the cell center reproduces the hash
    val (x0, y0, x1, y1) = Spatial.geohashDecode(gh)
    assert(x0 <= -5.603 && -5.603 < x1 && y0 <= 42.605 && 42.605 < y1)
    val ghC = Seq(((x0 + x1) / 2, (y0 + y1) / 2)).toDF("lon", "lat")
      .select(Spatial.geohashCol($"lon", $"lat").as("gh"))
      .head().getString(0)
    assert(ghC == gh)
    // poles/antimeridian clamp into the edge cells rather than corrupting bits
    val edge = Seq((180.0, 90.0), (-180.0, -90.0), (999.0, -999.0))
      .toDF("lon", "lat")
      .select(Spatial.geohashCol($"lon", $"lat").as("gh")).collect()
    assert(edge(0).getString(0) == "zzzzzzzz")
    assert(edge(1).getString(0) == "00000000")
    assert(edge(2).getString(0) == "pbpbpbpb") // lon clamps high, lat low
  }

  test("geodesic diamond area: equator matches the small-polygon planar value, high latitude shrinks by cos") {
    // 1.5-degree diamond at the equator: planar limit 2*(r*D*R)^2
    val D = math.Pi / 180.0
    val R = 6371008.8
    val planar = 2.0 * math.pow(1.5 * D * R, 2)
    val eq = Spatial.geodesicDiamondArea(10.0, 0.0).toDouble
    assert(math.abs(eq - planar) / planar < 0.01,
      s"equator area $eq vs planar $planar")
    // at 60 degrees the east-west extent contracts ~cos(60) = 0.5
    val hi = Spatial.geodesicDiamondArea(10.0, 60.0).toDouble
    val ratio = hi / eq
    assert(ratio > 0.4 && ratio < 0.6, s"lat-60 shrink ratio $ratio")
  }
}

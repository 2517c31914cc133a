package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Properties}
import java.nio.{ByteBuffer, ByteOrder}

class WkbSpec extends AnyFunSuite {

  test("point roundtrip preserves doubles bit-for-bit") {
    val b = Wkb.point(11.573, -48.0000001)
    assert(Wkb.geomType(b) == "POINT")
    val bb = Wkb.bbox(b)
    assert(bb.xmin == 11.573 && bb.xmax == 11.573)
    assert(bb.ymin == -48.0000001 && bb.ymax == -48.0000001)
  }

  test("linestring bbox") {
    val b = Wkb.lineString(Seq((0.0, 0.0), (2.0, -1.0), (1.0, 5.0)))
    assert(Wkb.geomType(b) == "LINESTRING")
    assert(Wkb.bbox(b) == Wkb.BBox(0.0, -1.0, 2.0, 5.0))
  }

  test("polygon with hole: bbox spans all rings") {
    val outer = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0))
    val hole = Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0))
    val b = Wkb.polygon(Seq(outer, hole))
    assert(Wkb.geomType(b) == "POLYGON")
    assert(Wkb.bbox(b) == Wkb.BBox(0.0, 0.0, 10.0, 10.0))
  }

  test("big-endian WKB is parsed too") {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.BIG_ENDIAN)
    bb.put(0.toByte).putInt(1).putDouble(3.25).putDouble(-7.5)
    val b = bb.array()
    assert(Wkb.geomType(b) == "POINT")
    assert(Wkb.bbox(b) == Wkb.BBox(3.25, -7.5, 3.25, -7.5))
  }

  test("bboxIntersects: overlap, touch, disjoint") {
    val box = Wkb.polygon(Seq(Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0))))
    assert(Wkb.bboxIntersects(box, 2, 2, 9, 9))   // overlap
    assert(Wkb.bboxIntersects(box, 4, 4, 9, 9))   // touch at corner
    assert(!Wkb.bboxIntersects(box, 4.01, 4.01, 9, 9)) // disjoint
  }

  test("EWKB SRID point: the 4-byte SRID is consumed, coords stay correct") {
    val bb = ByteBuffer.allocate(25).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(0x20000001).putInt(4326).putDouble(1.5).putDouble(2.25)
    assert(Wkb.geomType(bb.array()) == "POINT")
    assert(Wkb.bbox(bb.array()) == Wkb.BBox(1.5, 2.25, 1.5, 2.25))
  }

  test("EWKB Z point: stride 3, bbox is the XY envelope") {
    val bb = ByteBuffer.allocate(29).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(0x80000001).putDouble(3.0).putDouble(4.0).putDouble(99.0)
    assert(Wkb.geomType(bb.array()) == "POINT")
    assert(Wkb.bbox(bb.array()) == Wkb.BBox(3.0, 4.0, 3.0, 4.0))
  }

  test("EWKB SRID+ZM point, big-endian: all flags combined") {
    val bb = ByteBuffer.allocate(41).order(ByteOrder.BIG_ENDIAN)
    bb.put(0.toByte).putInt(0x20000001 | 0x80000000 | 0x40000000).putInt(31370)
      .putDouble(-1.0).putDouble(7.0).putDouble(10.0).putDouble(20.0)
    assert(Wkb.geomType(bb.array()) == "POINT")
    assert(Wkb.bbox(bb.array()) == Wkb.BBox(-1.0, 7.0, -1.0, 7.0))
  }

  test("ISO Z linestring (type 1002): 3 doubles per point, XY bbox") {
    val bb = ByteBuffer.allocate(9 + 2 * 24).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(1002).putInt(2)
      .putDouble(0.0).putDouble(1.0).putDouble(5.0)
      .putDouble(2.0).putDouble(-1.0).putDouble(6.0)
    assert(Wkb.geomType(bb.array()) == "LINESTRING")
    assert(Wkb.bbox(bb.array()) == Wkb.BBox(0.0, -1.0, 2.0, 1.0))
  }

  test("ISO ZM polygon (type 3003): 4 doubles per point") {
    val ring = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0))
    val bb = ByteBuffer.allocate(13 + ring.length * 32).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(3003).putInt(1).putInt(ring.length)
    ring.foreach { case (x, y) => bb.putDouble(x).putDouble(y).putDouble(9.0).putDouble(8.0) }
    assert(Wkb.geomType(bb.array()) == "POLYGON")
    assert(Wkb.bbox(bb.array()) == Wkb.BBox(0.0, 0.0, 4.0, 4.0))
  }

  test("EWKB SRID multipoint: members carry no SRID of their own") {
    val inner = Wkb.point(2.0, 3.0)
    val bb = ByteBuffer.allocate(13 + inner.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(0x20000004).putInt(4326).putInt(1).put(inner)
    assert(Wkb.geomType(bb.array()) == "MULTIPOINT")
    assert(Wkb.bbox(bb.array()) == Wkb.BBox(2.0, 3.0, 2.0, 3.0))
  }

  test("containsPoint: convex polygon, interior/exterior/near-edge") {
    val square = Wkb.polygon(Seq(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0))))
    assert(Wkb.containsPoint(square, 5.0, 5.0))
    assert(Wkb.containsPoint(square, 0.001, 9.999))
    assert(!Wkb.containsPoint(square, -0.001, 5.0))
    assert(!Wkb.containsPoint(square, 10.001, 5.0))
    assert(!Wkb.containsPoint(square, 5.0, -3.0))
  }

  test("containsPoint: concave L-shape — notch is outside") {
    // L-shape: 10x10 square minus its top-right 5x5 quadrant
    val l = Wkb.polygon(Seq(Seq(
      (0.0, 0.0), (10.0, 0.0), (10.0, 5.0), (5.0, 5.0), (5.0, 10.0), (0.0, 10.0), (0.0, 0.0))))
    assert(Wkb.containsPoint(l, 2.0, 8.0))   // vertical arm
    assert(Wkb.containsPoint(l, 8.0, 2.0))   // horizontal arm
    assert(Wkb.containsPoint(l, 4.9, 4.9))   // inner corner side
    assert(!Wkb.containsPoint(l, 7.0, 7.0))  // the notch
    assert(!Wkb.containsPoint(l, 5.1, 5.1))  // just inside the notch
  }

  test("containsPoint: polygon with hole — even-odd excludes the hole") {
    val outer = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0))
    val hole = Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0))
    val p = Wkb.polygon(Seq(outer, hole))
    assert(Wkb.containsPoint(p, 2.0, 2.0))
    assert(Wkb.containsPoint(p, 3.9, 5.0))
    assert(!Wkb.containsPoint(p, 5.0, 5.0))  // inside the hole
    assert(!Wkb.containsPoint(p, 11.0, 5.0))
  }

  test("containsPoint: multipolygon — any member contains") {
    val p1 = Wkb.polygon(Seq(Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0))))
    val p2 = Wkb.polygon(Seq(Seq((10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0), (10.0, 10.0))))
    val mp = Wkb.multi(6, Seq(p1, p2))
    assert(Wkb.containsPoint(mp, 1.0, 1.0))
    assert(Wkb.containsPoint(mp, 11.0, 11.0))
    assert(!Wkb.containsPoint(mp, 5.0, 5.0))  // the gap between members
  }

  test("containsPoint: EWKB SRID+Z polygon parses with correct stride") {
    val ring = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0))
    val bb = ByteBuffer.allocate(17 + ring.length * 24).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(0x20000003 | 0x80000000).putInt(4326).putInt(1).putInt(ring.length)
    ring.foreach { case (x, y) => bb.putDouble(x).putDouble(y).putDouble(7.0) }
    assert(Wkb.containsPoint(bb.array(), 5.0, 5.0))
    assert(!Wkb.containsPoint(bb.array(), 15.0, 5.0))
  }

  test("containsPoint: diamond matches the L1-ball arithmetic (a11c oracle shape)") {
    def diamond(c: Double, r: Double) =
      Wkb.polygon(Seq(Seq((c + r, c), (c, c + r), (c - r, c), (c, c - r), (c + r, c))))
    val d = diamond(100.0, 120.17)
    for (v <- Seq(0.01, 39.9, 40.1, 100.0, 159.95, 160.1, 490.02)) {
      val l1 = 2 * math.abs(v - 100.0)
      assert(Wkb.containsPoint(d, v, v) == (l1 < 120.17), s"v=$v l1=$l1")
    }
  }

  test("intersects: crossing, containment, disjoint, touch") {
    def sq(x0: Double, y0: Double, x1: Double, y1: Double) =
      Wkb.polygon(Seq(Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0))))
    assert(Wkb.intersects(sq(0, 0, 10, 10), sq(5, 5, 15, 15)))   // edge crossing
    assert(Wkb.intersects(sq(0, 0, 10, 10), sq(2, 2, 3, 3)))     // B inside A, no crossing
    assert(Wkb.intersects(sq(2, 2, 3, 3), sq(0, 0, 10, 10)))     // A inside B
    assert(!Wkb.intersects(sq(0, 0, 10, 10), sq(20, 20, 30, 30))) // disjoint
    assert(Wkb.intersects(sq(0, 0, 10, 10), sq(10, 0, 20, 10)))  // shared edge (touch)
    assert(Wkb.intersects(sq(0, 0, 10, 10), sq(10, 10, 20, 20))) // corner touch
  }

  test("intersects: geometry inside a hole does not intersect") {
    def sq(x0: Double, y0: Double, x1: Double, y1: Double) =
      Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0))
    val holed = Wkb.polygon(Seq(sq(0, 0, 20, 20), sq(5, 5, 15, 15)))
    val inHole = Wkb.polygon(Seq(sq(8, 8, 12, 12)))
    assert(!Wkb.intersects(holed, inHole), "hole interior counted as material")
    assert(!Wkb.intersects(inHole, holed), "asymmetric hole handling")
    val crossesHoleBoundary = Wkb.polygon(Seq(sq(3, 8, 8, 12)))
    assert(Wkb.intersects(holed, crossesHoleBoundary))
    val inMaterial = Wkb.polygon(Seq(sq(1, 1, 3, 3)))
    assert(Wkb.intersects(holed, inMaterial))
  }

  test("toWkt: canonical text for every geometry type, integral coords without decimals") {
    assert(Wkb.toWkt(Wkb.point(1.0, 2.5)) == "POINT (1 2.5)")
    assert(Wkb.toWkt(Wkb.lineString(Seq((0.0, 0.0), (1.5, -2.0)))) ==
      "LINESTRING (0 0, 1.5 -2)")
    assert(Wkb.toWkt(Wkb.polygon(Seq(
      Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)),
      Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 1.0))))) ==
      "POLYGON ((0 0, 4 0, 4 4, 0 0), (1 1, 2 1, 2 2, 1 1))")
    assert(Wkb.toWkt(Wkb.multi(4, Seq(Wkb.point(1.0, 2.0), Wkb.point(3.0, 4.0)))) ==
      "MULTIPOINT ((1 2), (3 4))")
    assert(Wkb.toWkt(Wkb.multi(5, Seq(
      Wkb.lineString(Seq((0.0, 0.0), (1.0, 1.0))),
      Wkb.lineString(Seq((2.0, 2.0), (3.0, 3.0)))))) ==
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))")
    assert(Wkb.toWkt(Wkb.multi(6, Seq(
      Wkb.polygon(Seq(Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0))))))) ==
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")
    assert(Wkb.toWkt(Wkb.multi(7, Seq(Wkb.point(5.0, 6.0),
      Wkb.lineString(Seq((0.0, 0.0), (1.0, 1.0)))))) ==
      "GEOMETRYCOLLECTION (POINT (5 6), LINESTRING (0 0, 1 1))")
    assert(Wkb.toWkt(Wkb.lineString(Nil)) == "LINESTRING EMPTY")
    assert(Wkb.toWkt(Wkb.polygon(Nil)) == "POLYGON EMPTY")
    assert(Wkb.toWkt(Wkb.multi(6, Nil)) == "MULTIPOLYGON EMPTY")
  }

  test("fromWkt: tolerated variations parse to the same canonical WKB") {
    def same(wkt: String, wkb: Array[Byte]): Unit =
      assert(java.util.Arrays.equals(Wkb.fromWkt(wkt), wkb), wkt)
    same("MULTIPOINT (1 2, 3 4)", Wkb.multi(4, Seq(Wkb.point(1.0, 2.0), Wkb.point(3.0, 4.0))))
    same("  point ( 1   2.5 ) ", Wkb.point(1.0, 2.5))
    // Z/M markers: ordinates CARRIED into ISO-typed WKB (r17 — the
    // XY-only drop policy is gone across the codec family)
    same("POINT Z (1 2 9)",
      Wkb.pointIso(Vector(1.0, 2.0, 9.0), hasZ = true, hasM = false))
    same("LINESTRING ZM (0 0 7 8, 1 1 7 8)",
      Wkb.lineStringIso(Seq(Vector(0.0, 0.0, 7.0, 8.0), Vector(1.0, 1.0, 7.0, 8.0)),
        hasZ = true, hasM = true))
    // and the write side round-trips them marker-for-marker
    assert(Wkb.toWkt(Wkb.fromWkt("POINT Z (1 2 9)")) == "POINT Z (1 2 9)")
    assert(Wkb.toWkt(Wkb.fromWkt("LINESTRING ZM (0 0 7 8, 1 1 7 8)")) ==
      "LINESTRING ZM (0 0 7 8, 1 1 7 8)")
    assert(Wkb.toWkt(Wkb.fromWkt("MULTIPOINT M ((1 2 5), (3 4 6))")) ==
      "MULTIPOINT M ((1 2 5), (3 4 6))")
    same("POLYGON EMPTY", Wkb.polygon(Nil))
    same("GEOMETRYCOLLECTION EMPTY", Wkb.multi(7, Nil))
    // scientific notation and signs
    same("POINT (-1.5e2 +0.25)", Wkb.point(-150.0, 0.25))
    intercept[IllegalArgumentException](Wkb.fromWkt("POINT EMPTY"))
    intercept[IllegalArgumentException](Wkb.fromWkt("POINT (1 2) junk"))
    intercept[IllegalArgumentException](Wkb.fromWkt("CIRCLE (1 2)"))
    intercept[IllegalArgumentException](Wkb.fromWkt("POLYGON ((1 2"))
  }

  test("length: 3-4-5 segments, multilinestring sum, degenerate cases") {
    assert(Wkb.length(Wkb.lineString(Seq((0.0, 0.0), (3.0, 4.0)))) == 5.0)
    assert(Wkb.length(Wkb.lineString(Seq((0.0, 0.0), (3.0, 4.0), (3.0, 14.0)))) == 15.0)
    assert(Wkb.length(Wkb.multi(5, Seq(
      Wkb.lineString(Seq((0.0, 0.0), (3.0, 4.0))),
      Wkb.lineString(Seq((10.0, 0.0), (10.0, 2.0)))))) == 7.0)
    assert(Wkb.length(Wkb.lineString(Seq((1.0, 1.0)))) == 0.0)
    assert(Wkb.length(Wkb.lineString(Nil)) == 0.0)
    intercept[IllegalArgumentException](Wkb.length(Wkb.point(0.0, 0.0)))
  }

  test("length3d: Z joins the norm; 2D and XYM inputs match plain length exactly") {
    val lz = Wkb.lineStringIso(Seq(Vector(0.0, 0.0, 0.0), Vector(3.0, 4.0, 12.0)),
      hasZ = true, hasM = false)
    assert(Wkb.length3d(lz) == 13.0) // 3-4-12-13 quadruple
    val l2 = Wkb.lineString(Seq((0.0, 0.0), (3.0, 4.0)))
    assert(Wkb.length3d(l2) == 5.0 && Wkb.length3d(l2) == Wkb.length(l2))
    // XYM: the measure is NOT a coordinate — 3D length ignores it
    val lm = Wkb.lineStringIso(Seq(Vector(0.0, 0.0, 99.0), Vector(3.0, 4.0, 7.0)),
      hasZ = false, hasM = true)
    assert(Wkb.length3d(lm) == 5.0)
    // multilinestring sums members, mixed dims per member
    assert(Wkb.length3d(Wkb.multiIso(5, hasZ = true, hasM = false,
      Seq(lz, Wkb.lineStringIso(Seq(Vector(0.0, 0.0, 0.0), Vector(0.0, 0.0, 2.0)),
        hasZ = true, hasM = false)))) == 15.0)
    intercept[IllegalArgumentException](Wkb.length3d(Wkb.point(0.0, 0.0)))
  }

  test("simplify: collinear vertices dropped, genuine corners kept, endpoints survive") {
    val line = Wkb.lineString(Seq(
      (0.0, 0.0), (1.0, 0.001), (2.0, -0.001), (3.0, 0.0), // ~collinear run
      (3.0, 5.0), (6.0, 5.0)))                              // real corners
    val simp = Wkb.simplify(line, 0.01)
    assert(Wkb.toWkt(simp) == "LINESTRING (0 0, 3 0, 3 5, 6 5)")
    // epsilon below the wiggle keeps everything
    assert(java.util.Arrays.equals(Wkb.simplify(line, 0.0001), line))
    // 2-point lines pass through untouched
    val seg = Wkb.lineString(Seq((0.0, 0.0), (1.0, 1.0)))
    assert(java.util.Arrays.equals(Wkb.simplify(seg, 10.0), seg))
    // simplification never lengthens the line
    assert(Wkb.length(simp) <= Wkb.length(line))
  }

  test("toWkt: reads non-canonical dialects (big-endian, EWKB SRID+Z)") {
    // big-endian plain point
    val be = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.BIG_ENDIAN)
    be.put(0.toByte).putInt(1).putDouble(7.0).putDouble(8.0)
    assert(Wkb.toWkt(be.array()) == "POINT (7 8)")
    // EWKB little-endian point with SRID and Z: flags consumed, the Z
    // ordinate carried with its marker (SRID has no WKT slot)
    val ew = java.nio.ByteBuffer.allocate(33).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ew.put(1.toByte).putInt(1 | 0x80000000 | 0x20000000).putInt(4326)
      .putDouble(1.5).putDouble(2.5).putDouble(99.0)
    assert(Wkb.toWkt(ew.array()) == "POINT Z (1.5 2.5 99)")
  }

  test("intersects: crossing only through the implicit closing edge of an unclosed ring") {
    // unclosed triangle: stored edges (0,0)-(10,0), (10,0)-(5,10); the
    // closing edge (5,10)-(0,0) exists only by ring convention
    val triOpen = Wkb.polygon(Seq(Seq((0.0, 0.0), (10.0, 0.0), (5.0, 10.0))))
    // thin bar crossing ONLY that closing edge; its first vertex (1,4.75)
    // is outside the triangle and the triangle's first vertex is outside
    // the bar, so the vertex-containment fallback cannot mask a missed
    // closing-edge crossing
    val bar = Wkb.polygon(Seq(Seq(
      (1.0, 4.75), (4.0, 4.75), (4.0, 5.25), (1.0, 5.25), (1.0, 4.75))))
    assert(Wkb.intersects(triOpen, bar), "closing-edge crossing missed")
    assert(Wkb.intersects(bar, triOpen), "asymmetric closing-edge handling")
    // closed variant agrees, and area is identical either way
    val triClosed = Wkb.polygon(Seq(Seq((0.0, 0.0), (10.0, 0.0), (5.0, 10.0), (0.0, 0.0))))
    assert(Wkb.intersects(triClosed, bar))
    assert(Wkb.area(triOpen) == Wkb.area(triClosed))
  }

  test("intersects: multipolygon members checked independently") {
    def sq(x0: Double, y0: Double, x1: Double, y1: Double) =
      Wkb.polygon(Seq(Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0))))
    val mp = Wkb.multi(6, Seq(sq(0, 0, 2, 2), sq(50, 50, 60, 60)))
    assert(Wkb.intersects(mp, sq(52, 52, 55, 55)), "second member containment missed")
    assert(Wkb.intersects(sq(52, 52, 55, 55), mp))
    assert(!Wkb.intersects(mp, sq(10, 10, 20, 20)))
  }

  test("intersects: diamond pair matches the L1 Minkowski arithmetic (a11e oracle shape)") {
    def diamond(c: Double, r: Double) =
      Wkb.polygon(Seq(Seq((c + r, c), (c, c + r), (c - r, c), (c, c - r), (c + r, c))))
    for (v <- Seq(0.01, 47.3, 52.7, 100.0, 152.6, 153.0, 490.02)) {
      val a = diamond(100.0, 60.13)
      val b = diamond(v, 45.12)
      val expected = 2 * math.abs(v - 100.0) < 105.25
      assert(Wkb.intersects(a, b) == expected, s"v=$v")
    }
  }

  test("area: square, square with hole, multipolygon, ring-order independence") {
    def sq(x0: Double, y0: Double, x1: Double, y1: Double) =
      Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0))
    assert(Wkb.area(Wkb.polygon(Seq(sq(0, 0, 10, 10)))) == 100.0)
    assert(Wkb.area(Wkb.polygon(Seq(sq(0, 0, 10, 10), sq(2, 2, 4, 4)))) == 96.0)
    // winding direction must not matter (abs per ring)
    assert(Wkb.area(Wkb.polygon(Seq(sq(0, 0, 10, 10).reverse))) == 100.0)
    val mp = Wkb.multi(6, Seq(
      Wkb.polygon(Seq(sq(0, 0, 2, 2))), Wkb.polygon(Seq(sq(10, 10, 13, 13)))))
    assert(Wkb.area(mp) == 4.0 + 9.0)
    intercept[IllegalArgumentException](Wkb.area(Wkb.point(1, 2)))
  }

  test("area: diamond equals 2r^2 up to IEEE rounding of the shoelace chain") {
    def diamond(c: Double, r: Double) =
      Wkb.polygon(Seq(Seq((c + r, c), (c, c + r), (c - r, c), (c, c - r), (c + r, c))))
    val a = Wkb.area(diamond(100.0, 3.0))
    assert(math.abs(a - 18.0) < 1e-9, a.toString)
  }

  test("containsPoint rejects non-areal geometry") {
    intercept[IllegalArgumentException](Wkb.containsPoint(Wkb.point(1.0, 2.0), 1.0, 2.0))
    intercept[IllegalArgumentException](
      Wkb.containsPoint(Wkb.lineString(Seq((0.0, 0.0), (1.0, 1.0))), 0.5, 0.5))
  }

  test("unsupported ISO thousands range throws, never misparses") {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(5001).putDouble(1.0).putDouble(2.0)
    intercept[IllegalArgumentException](Wkb.bbox(bb.array()))
    intercept[IllegalArgumentException](Wkb.geomType(bb.array()))
  }

  test("multi-geometries and collections: recursive bbox, mixed endianness") {
    val p1 = Wkb.point(1.0, 2.0)
    // big-endian member inside a little-endian collection
    val bbBE = ByteBuffer.allocate(21).order(ByteOrder.BIG_ENDIAN)
    bbBE.put(0.toByte).putInt(1).putDouble(10.0).putDouble(-3.0)
    val p2 = bbBE.array()
    val mp = Wkb.multi(4, Seq(p1, p2))
    assert(Wkb.geomType(mp) == "MULTIPOINT")
    assert(Wkb.bbox(mp) == Wkb.BBox(1.0, -3.0, 10.0, 2.0))

    val ml = Wkb.multi(5, Seq(Wkb.lineString(Seq((0.0, 0.0), (5.0, 5.0)))))
    assert(Wkb.geomType(ml) == "MULTILINESTRING")
    assert(Wkb.bbox(ml) == Wkb.BBox(0.0, 0.0, 5.0, 5.0))

    val poly = Wkb.polygon(Seq(Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0))))
    val mpoly = Wkb.multi(6, Seq(poly))
    assert(Wkb.geomType(mpoly) == "MULTIPOLYGON")
    assert(Wkb.bbox(mpoly) == Wkb.BBox(0.0, 0.0, 2.0, 2.0))

    // nested: collection containing the multipoint and a polygon
    val gc = Wkb.multi(7, Seq(mp, poly))
    assert(Wkb.geomType(gc) == "GEOMETRYCOLLECTION")
    assert(Wkb.bbox(gc) == Wkb.BBox(0.0, -3.0, 10.0, 2.0))
  }

  // ------------------------------------------------ clipPolygonRect (a11x)
  private def square(x0: Double, y0: Double, x1: Double, y1: Double) =
    Wkb.polygon(Seq(Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0))))

  test("clipPolygonRect: polygon fully inside the window is unchanged") {
    val sq = square(1.0, 1.0, 2.0, 2.0)
    val c = Wkb.clipPolygonRect(sq, 0.0, 0.0, 10.0, 10.0)
    assert(Wkb.bbox(c) == Wkb.BBox(1.0, 1.0, 2.0, 2.0))
    assert(math.abs(Wkb.area(c) - 1.0) < 1e-12)
  }

  test("clipPolygonRect: polygon fully outside returns null") {
    assert(Wkb.clipPolygonRect(square(20.0, 20.0, 30.0, 30.0), 0.0, 0.0, 10.0, 10.0) == null)
  }

  test("clipPolygonRect: half-overlapping square is cut at the boundary") {
    // square [-1,1]^2 clipped to x>=0 → [0,1]x[-1,1], area 2
    val c = Wkb.clipPolygonRect(square(-1.0, -1.0, 1.0, 1.0), 0.0, -5.0, 5.0, 5.0)
    assert(Wkb.bbox(c) == Wkb.BBox(0.0, -1.0, 1.0, 1.0))
    assert(math.abs(Wkb.area(c) - 2.0) < 1e-12)
  }

  test("clipPolygonRect: diamond corner clip introduces the crossing vertices") {
    // diamond centered origin, r=2, clipped to the first quadrant:
    // triangle (2,0)-(0,2)-(0,0), area 2, 3-4 vertices depending on corner
    val d = Wkb.polygon(Seq(Seq((2.0, 0.0), (0.0, 2.0), (-2.0, 0.0), (0.0, -2.0), (2.0, 0.0))))
    val c = Wkb.clipPolygonRect(d, 0.0, 0.0, 10.0, 10.0)
    assert(Wkb.bbox(c) == Wkb.BBox(0.0, 0.0, 2.0, 2.0))
    assert(math.abs(Wkb.area(c) - 2.0) < 1e-12)
    // output is a closed ring over the surviving + crossing vertices
    val ring = Wkb.outerRing(c)
    assert(ring.head == ring.last)
    assert(ring.forall { case (x, y) => x >= 0.0 && y >= 0.0 })
  }

  test("clipPolygonRect: window degenerate touch keeps identical-arithmetic vertices") {
    // boundary exactly on a vertex: inside test is >=/<=, so the vertex stays
    val d = Wkb.polygon(Seq(Seq((2.0, 0.0), (0.0, 2.0), (-2.0, 0.0), (0.0, -2.0), (2.0, 0.0))))
    val c = Wkb.clipPolygonRect(d, -2.0, -2.0, 2.0, 2.0)
    assert(math.abs(Wkb.area(c) - Wkb.area(d)) < 1e-12)
  }

  // ------------------------------------------- clipPolygonRectWA (a11w)
  private def ccwRing(pts: (Double, Double)*) = Wkb.polygon(Seq(pts :+ pts.head))
  private def pieceAreas(ps: Seq[Array[Byte]]): Seq[Double] = ps.map(Wkb.area)
  private def pieceVtx(ps: Seq[Array[Byte]]): Seq[Int] =
    ps.map(p => Wkb.outerRing(p).length - 1) // writer closes the ring

  test("clipPolygonRectWA: comb subject splits into one piece per tooth") {
    // 3 teeth at x [0,1],[2,3],[4,5], spine y [0,1], teeth to y=3; window
    // bottom at y=2 cuts above the spine — SH would weld these with
    // bridges, W-A must emit 3 separate rectangles (all exact binary)
    val comb = ccwRing((0.0, 0.0), (5.0, 0.0), (5.0, 3.0), (4.0, 3.0), (4.0, 1.0),
      (3.0, 1.0), (3.0, 3.0), (2.0, 3.0), (2.0, 1.0), (1.0, 1.0), (1.0, 3.0), (0.0, 3.0))
    val ps = Wkb.clipPolygonRectWA(comb, -10.0, 2.0, 10.0, 10.0)
    assert(ps.length == 3, s"expected 3 pieces, got ${ps.length}")
    assert(pieceVtx(ps) == Seq(4, 4, 4))
    assert(pieceAreas(ps).forall(a => a == 1.0), pieceAreas(ps))
    // piece-area sum == the SH clip's welded signed area (exact here)
    val sh = Wkb.clipPolygonRect(comb, -10.0, 2.0, 10.0, 10.0)
    assert(Wkb.area(sh) == 3.0)
  }

  test("clipPolygonRectWA: x-cut comb — boundary teeth are trimmed, corner vertices appear") {
    val comb = ccwRing((0.0, 0.0), (5.0, 0.0), (5.0, 3.0), (4.0, 3.0), (4.0, 1.0),
      (3.0, 1.0), (3.0, 3.0), (2.0, 3.0), (2.0, 1.0), (1.0, 1.0), (1.0, 3.0), (0.0, 3.0))
    val ps = Wkb.clipPolygonRectWA(comb, 0.5, 2.0, 4.5, 10.0)
    assert(ps.length == 3)
    assert(pieceAreas(ps).sorted == Seq(0.5, 0.5, 1.0))
    assert(pieceVtx(ps) == Seq(4, 4, 4))
    val boxes = ps.map(Wkb.bbox).sortBy(_.xmin)
    assert(boxes(0) == Wkb.BBox(0.5, 2.0, 1.0, 3.0))
    assert(boxes(1) == Wkb.BBox(2.0, 2.0, 3.0, 3.0))
    assert(boxes(2) == Wkb.BBox(4.0, 2.0, 4.5, 3.0))
  }

  test("clipPolygonRectWA: U-shape — the window sees two disconnected arms") {
    // U: outer [0,5]^2 minus slot [2,3]x[1,5]; horizontal window band
    // y in [2,4] crosses both arms ("hole through the window")
    val u = ccwRing((0.0, 0.0), (5.0, 0.0), (5.0, 5.0), (3.0, 5.0), (3.0, 1.0),
      (2.0, 1.0), (2.0, 5.0), (0.0, 5.0))
    val ps = Wkb.clipPolygonRectWA(u, -1.0, 2.0, 6.0, 4.0)
    assert(ps.length == 2)
    assert(pieceAreas(ps).forall(_ == 4.0), pieceAreas(ps))
    val boxes = ps.map(Wkb.bbox).sortBy(_.xmin)
    assert(boxes(0) == Wkb.BBox(0.0, 2.0, 2.0, 4.0))
    assert(boxes(1) == Wkb.BBox(3.0, 2.0, 5.0, 4.0))
  }

  test("clipPolygonRectWA: serpentine winding yields one piece per bar crossed") {
    // three horizontal bars joined alternately right/left (the spiral
    // class); a vertical window slab cuts each bar into its own piece
    val snake = ccwRing((0.0, 0.0), (5.0, 0.0), (5.0, 3.0), (1.0, 3.0), (1.0, 4.0),
      (5.0, 4.0), (5.0, 5.0), (0.0, 5.0), (0.0, 2.0), (4.0, 2.0), (4.0, 1.0), (0.0, 1.0))
    val ps = Wkb.clipPolygonRectWA(snake, 2.0, -1.0, 3.0, 6.0)
    assert(ps.length == 3, s"expected 3 pieces, got ${ps.length}")
    assert(pieceAreas(ps).forall(_ == 1.0), pieceAreas(ps))
  }

  test("clipPolygonRectWA: L-around-corner piece collects the window corners it wraps") {
    val l = ccwRing((-1.0, -1.0), (5.0, -1.0), (5.0, 1.0), (1.0, 1.0), (1.0, 5.0), (-1.0, 5.0))
    val ps = Wkb.clipPolygonRectWA(l, 0.0, 0.0, 4.0, 4.0)
    assert(ps.length == 1)
    assert(pieceVtx(ps) == Seq(6)) // 2 crossings + 1 subject vertex + 3 window corners
    assert(pieceAreas(ps) == Seq(7.0))
    val ring = Wkb.outerRing(ps.head)
    assert(ring.contains((0.0, 0.0)) && ring.contains((4.0, 0.0)) && ring.contains((0.0, 4.0)))
  }

  test("clipPolygonRectWA: no-crossing cases — inside, containing, disjoint") {
    val sq = square(1.0, 1.0, 2.0, 2.0)
    val in = Wkb.clipPolygonRectWA(sq, 0.0, 0.0, 10.0, 10.0)
    assert(in.length == 1 && Wkb.area(in.head) == 1.0)
    assert(Wkb.bbox(in.head) == Wkb.BBox(1.0, 1.0, 2.0, 2.0))
    val contains = Wkb.clipPolygonRectWA(square(-10.0, -10.0, 10.0, 10.0), 0.0, 0.0, 4.0, 4.0)
    assert(contains.length == 1 && Wkb.area(contains.head) == 16.0)
    assert(Wkb.clipPolygonRectWA(square(20.0, 20.0, 30.0, 30.0), 0.0, 0.0, 10.0, 10.0).isEmpty)
  }

  test("clipPolygonRectWA: CW input ring is normalized, pieces come out CCW") {
    val cw = Wkb.polygon(Seq(Seq((1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0))))
    val ps = Wkb.clipPolygonRectWA(cw, 0.0, 0.0, 10.0, 10.0)
    assert(ps.length == 1 && Wkb.area(ps.head) == 1.0)
    // signed shoelace of the emitted ring must be positive (CCW)
    val ring = Wkb.outerRing(ps.head).dropRight(1)
    val s2 = ring.indices.map { j =>
      val v = ring(j); val u = ring((j + 1) % ring.length)
      v._1 * u._2 - u._1 * v._2
    }.sum
    assert(s2 > 0, s"piece not CCW: signed2=$s2")
  }

  test("clipPolygonRectWA: degenerate tangency throws loudly, never silently misclips") {
    // vertex exactly on the window boundary line
    val onEdge = ccwRing((0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0))
    val e1 = intercept[IllegalArgumentException] {
      Wkb.clipPolygonRectWA(onEdge, 0.0, -1.0, 10.0, 10.0)
    }
    assert(e1.getMessage.contains("boundary line"), e1.getMessage)
    // edge passing exactly through a window corner
    val diag = ccwRing((-1.0, -1.0), (1.0, 1.0), (-1.0, 1.0))
    val e2 = intercept[IllegalArgumentException] {
      Wkb.clipPolygonRectWA(diag, 0.0, 0.0, 2.0, 2.0)
    }
    assert(e2.getMessage.contains("corner"), e2.getMessage)
  }

  // ---------------------------------------------- intersectPolygons (a11ax)
  test("intersectPolygons: concave comb x concave comb — one exact rectangle per tooth-row pair") {
    // A: 3 vertical teeth at x [0,1],[2,3],[4,5] rising from a spine;
    // B: 2 horizontal rows at y [1.25,1.75],[2.25,2.75] off a left spine.
    // Spines overlap nothing; the intersection is the 3x2 grid of
    // tooth∩row rectangles, every coordinate exact binary.
    val a = ccwRing((0.0, 0.0), (5.0, 0.0), (5.0, 3.0), (4.0, 3.0), (4.0, 1.0),
      (3.0, 1.0), (3.0, 3.0), (2.0, 3.0), (2.0, 1.0), (1.0, 1.0), (1.0, 3.0), (0.0, 3.0))
    val b = ccwRing((-2.0, 1.125), (-1.0, 1.125), (-1.0, 1.25), (6.0, 1.25),
      (6.0, 1.75), (-1.0, 1.75), (-1.0, 2.25), (6.0, 2.25), (6.0, 2.75),
      (-1.0, 2.75), (-1.0, 2.875), (-2.0, 2.875))
    val ps = Wkb.intersectPolygons(a, b)
    assert(ps.length == 6, s"expected 6 pieces, got ${ps.length}")
    assert(pieceVtx(ps) == Seq.fill(6)(4))
    assert(pieceAreas(ps).forall(_ == 0.5), pieceAreas(ps))
    val boxes = ps.map(Wkb.bbox).sortBy(bx => (bx.xmin, bx.ymin))
    val want = for (tx <- Seq(0.0, 2.0, 4.0); ry <- Seq(1.25, 2.25))
      yield Wkb.BBox(tx, ry, tx + 1.0, ry + 0.5)
    assert(boxes == want, boxes.toString)
    // operand order does not change the region
    val sym = Wkb.intersectPolygons(b, a)
    assert(sym.length == 6 && math.abs(pieceAreas(sym).sum - 3.0) < 1e-12)
    // every piece CCW
    ps.foreach { p =>
      val ring = Wkb.outerRing(p).dropRight(1)
      val s2 = ring.indices.map { j =>
        val v = ring(j); val u = ring((j + 1) % ring.length)
        v._1 * u._2 - u._1 * v._2
      }.sum
      assert(s2 > 0, s"piece not CCW: signed2=$s2")
    }
  }

  test("intersectPolygons: non-rectilinear concave subject x convex clip agrees with clipPolygonConvex") {
    // concave arrow-head vs a tilted convex quadrilateral: the general
    // traversal must reproduce the SH convex clip's region (different
    // IEEE chains — compare areas within ulps, not bytes)
    // notch at (3, 1.4), NOT (3, 1.5): the h1/h2 split diagonal below
    // passes exactly through (3, 1.5) and a vertex-on-edge tangency
    // would (correctly) refuse
    val arrow = ccwRing((0.0, 0.0), (6.0, -1.0), (3.0, 1.4), (6.0, 4.0), (0.0, 3.0))
    val quad = IndexedSeq((1.0, -2.0), (7.0, 0.5), (5.0, 5.0), (-1.0, 2.5))
    val ps = Wkb.intersectPolygons(arrow, Wkb.polygon(Seq(quad :+ quad.head)))
    val sh = Wkb.clipPolygonConvex(arrow, quad)
    assert(ps.nonEmpty && sh != null)
    assert(math.abs(pieceAreas(ps).sum - Wkb.area(sh)) < 1e-9,
      s"${pieceAreas(ps).sum} vs ${Wkb.area(sh)}")
    // split-additivity: clipping against the two halves of the quad
    // partitions the region (cut through quad vertices, clear of arrow
    // vertices)
    val h1 = IndexedSeq((1.0, -2.0), (7.0, 0.5), (-1.0, 2.5))
    val h2 = IndexedSeq((7.0, 0.5), (5.0, 5.0), (-1.0, 2.5))
    val a1 = pieceAreas(Wkb.intersectPolygons(arrow, Wkb.polygon(Seq(h1 :+ h1.head)))).sum
    val a2 = pieceAreas(Wkb.intersectPolygons(arrow, Wkb.polygon(Seq(h2 :+ h2.head)))).sum
    assert(math.abs(a1 + a2 - pieceAreas(ps).sum) < 1e-9, s"$a1 + $a2 vs ${pieceAreas(ps).sum}")
  }

  test("intersectPolygons: no-crossing cases — inside, containing, disjoint") {
    val comb = ccwRing((0.0, 0.0), (5.0, 0.0), (5.0, 3.0), (4.0, 3.0), (4.0, 1.0),
      (3.0, 1.0), (3.0, 3.0), (2.0, 3.0), (2.0, 1.0), (1.0, 1.0), (1.0, 3.0), (0.0, 3.0))
    // small square fully inside tooth 1
    val in = Wkb.intersectPolygons(square(0.25, 1.5, 0.75, 2.0), comb)
    assert(in.length == 1 && Wkb.area(in.head) == 0.25)
    // comb fully inside a big square: the comb comes back
    val contains = Wkb.intersectPolygons(square(-10.0, -10.0, 10.0, 10.0), comb)
    assert(contains.length == 1 && math.abs(Wkb.area(contains.head) - Wkb.area(comb)) < 1e-12)
    assert(Wkb.intersectPolygons(square(20.0, 20.0, 21.0, 21.0), comb).isEmpty)
  }

  private def numRings(wkb: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(5)
  private def wkbTypeWord(wkb: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(1)

  test("unionPolygons: interlocking combs — one outer ring, (nA-1)*nB trapped holes, exact area") {
    val a = ccwRing((0.0, 0.0), (5.0, 0.0), (5.0, 3.0), (4.0, 3.0), (4.0, 1.0),
      (3.0, 1.0), (3.0, 3.0), (2.0, 3.0), (2.0, 1.0), (1.0, 1.0), (1.0, 3.0), (0.0, 3.0))
    val b = ccwRing((-2.0, 1.125), (-1.0, 1.125), (-1.0, 1.25), (6.0, 1.25),
      (6.0, 1.75), (-1.0, 1.75), (-1.0, 2.25), (6.0, 2.25), (6.0, 2.75),
      (-1.0, 2.75), (-1.0, 2.875), (-2.0, 2.875))
    val u = Wkb.unionPolygons(a, b)
    // area(A)=11, area(B)=1.75+7=8.75, inter=3 → union area 16.75; the
    // tooth-row lattice traps (3-1)*2 = 4 cells between teeth, plus 1
    // more between the two spines (between the rows): 5 holes
    assert(wkbTypeWord(u) == 3 && numRings(u) == 6, s"${wkbTypeWord(u)}/${numRings(u)}")
    assert(Wkb.area(u) == 16.75, Wkb.area(u).toString)
    // operand order invariance (region equality via area + ring census)
    val u2 = Wkb.unionPolygons(b, a)
    assert(Wkb.area(u2) == 16.75 && numRings(u2) == 6)
    // no-crossing arms: containment collapses, disjoint goes MULTI
    val inside = Wkb.unionPolygons(square(0.25, 0.25, 0.75, 0.75), a)
    assert(Wkb.area(inside) == 11.0 && numRings(inside) == 1)
    val dis = Wkb.unionPolygons(square(20.0, 20.0, 21.0, 21.0), a)
    assert(wkbTypeWord(dis) == 6 && Wkb.area(dis) == 12.0)
  }

  test("differencePolygons: comb minus rows — nA*nB islands plus the connected body, exact area") {
    val a = ccwRing((0.0, 0.0), (5.0, 0.0), (5.0, 3.0), (4.0, 3.0), (4.0, 1.0),
      (3.0, 1.0), (3.0, 3.0), (2.0, 3.0), (2.0, 1.0), (1.0, 1.0), (1.0, 3.0), (0.0, 3.0))
    val b = ccwRing((-2.0, 1.125), (-1.0, 1.125), (-1.0, 1.25), (6.0, 1.25),
      (6.0, 1.75), (-1.0, 1.75), (-1.0, 2.25), (6.0, 2.25), (6.0, 2.75),
      (-1.0, 2.75), (-1.0, 2.875), (-2.0, 2.875))
    // A \\ B: each tooth is bitten into 2 islands (between and above the
    // rows) while the bottom segments stay joined through the spine
    val d = Wkb.differencePolygons(a, b)
    assert(d.length == 3 * 2 + 1, s"${d.length} pieces")
    assert(pieceAreas(d).sum == 11.0 - 3.0, pieceAreas(d).toString)
    // B \\ A: rows bitten by teeth — 3 islands per row, body keeps the
    // left stubs through the spine
    val d2 = Wkb.differencePolygons(b, a)
    assert(d2.length == 7 && pieceAreas(d2).sum == 8.75 - 3.0, s"${d2.length}")
    // symmetric difference = both walks, disjoint pieces
    val sd = Wkb.symDifferencePolygons(a, b)
    assert(sd.length == 14 && pieceAreas(sd).sum == 8.0 + 5.75)
    // no-crossing arms
    val hole = Wkb.differencePolygons(a, square(0.25, 0.25, 0.75, 0.75))
    assert(hole.length == 1 && numRings(hole.head) == 2 &&
      Wkb.area(hole.head) == 11.0 - 0.25)
    assert(Wkb.differencePolygons(square(0.25, 0.25, 0.75, 0.75), a).isEmpty)
    val disj = Wkb.differencePolygons(a, square(20.0, 20.0, 21.0, 21.0))
    assert(disj.length == 1 && Wkb.area(disj.head) == 11.0)
  }

  test("union/difference: non-rectilinear concave operands obey inclusion-exclusion") {
    val arrow = ccwRing((0.0, 0.0), (6.0, -1.0), (3.0, 1.4), (6.0, 4.0), (0.0, 3.0))
    val quad = ccwRing((1.0, -2.0), (7.0, 0.5), (5.0, 5.0), (-1.0, 2.5))
    val inter = pieceAreas(Wkb.intersectPolygons(arrow, quad)).sum
    val aArea = Wkb.area(arrow); val qArea = Wkb.area(quad)
    assert(math.abs(Wkb.area(Wkb.unionPolygons(arrow, quad)) -
      (aArea + qArea - inter)) < 1e-9)
    assert(math.abs(pieceAreas(Wkb.differencePolygons(arrow, quad)).sum -
      (aArea - inter)) < 1e-9)
    assert(math.abs(pieceAreas(Wkb.symDifferencePolygons(arrow, quad)).sum -
      (aArea + qArea - 2 * inter)) < 1e-9)
    // every difference piece CCW
    Wkb.differencePolygons(arrow, quad).foreach { p =>
      val ring = Wkb.outerRing(p).dropRight(1)
      val s2 = ring.indices.map { j =>
        val v = ring(j); val u = ring((j + 1) % ring.length)
        v._1 * u._2 - u._1 * v._2
      }.sum
      assert(s2 > 0, s"difference piece not CCW: $s2")
    }
  }

  test("intersectPolygons: degeneracies refuse loudly — vertex on edge, shared collinear edge") {
    val sq = square(0.0, 0.0, 4.0, 4.0)
    // B vertex lands exactly on A's bottom edge (u = 1 at t = 0.5)
    val touch = ccwRing((2.0, 0.0), (5.0, -2.0), (5.0, 2.0))
    val e1 = intercept[IllegalArgumentException] {
      Wkb.intersectPolygons(sq, touch)
    }
    assert(e1.getMessage.contains("perturb"), e1.getMessage)
    // shared boundary segment (collinear overlap): A's first edge IS the
    // shared one, and B's contact vertices sit OUTSIDE A's edge span so
    // the collinear branch (not a vertex-on-edge pair) is what fires
    val aShared = ccwRing((4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0))
    val bShared = ccwRing((4.0, -1.0), (6.0, -1.0), (6.0, 5.0), (4.0, 5.0))
    val e2 = intercept[IllegalArgumentException] {
      Wkb.intersectPolygons(aShared, bShared)
    }
    assert(e2.getMessage.contains("collinear"), e2.getMessage)
    // holed / multi-member operands refuse loudly: the walk runs on one
    // outer ring but the insideness tests see ALL rings — silently
    // dropping a hole would misclassify entry/exit with no require firing
    val holed = Wkb.polygon(Seq(
      Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)),
      Seq((4.0, 4.0), (4.0, 6.0), (6.0, 6.0), (6.0, 4.0), (4.0, 4.0))))
    val e3 = intercept[IllegalArgumentException] {
      Wkb.intersectPolygons(holed, sq)
    }
    assert(e3.getMessage.contains("ring"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      Wkb.unionPolygons(sq, Wkb.multi(6, Seq(sq, square(20.0, 20.0, 21.0, 21.0))))
    }
    assert(e4.getMessage.contains("member"), e4.getMessage)
  }

  // ---------------------------------------------- clipPolygonConvex (a11z)
  test("clipPolygonConvex: rectangle window reproduces the rect-clip region") {
    // same region as the rect clip (values differ only in the crossing
    // arithmetic, exact here because everything lands on whole numbers)
    val d = Wkb.polygon(Seq(Seq((2.0, 0.0), (0.0, 2.0), (-2.0, 0.0), (0.0, -2.0), (2.0, 0.0))))
    val win = IndexedSeq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    val c = Wkb.clipPolygonConvex(d, win)
    assert(Wkb.bbox(c) == Wkb.BBox(0.0, 0.0, 2.0, 2.0))
    assert(math.abs(Wkb.area(c) - 2.0) < 1e-12)
  }

  test("clipPolygonConvex: subject inside a triangle window is unchanged") {
    val sq = square(1.0, 1.0, 2.0, 2.0)
    val tri = IndexedSeq((0.0, 0.0), (20.0, 0.0), (0.0, 20.0))
    val c = Wkb.clipPolygonConvex(sq, tri)
    assert(math.abs(Wkb.area(c) - 1.0) < 1e-12)
  }

  test("clipPolygonConvex: disjoint clip returns null") {
    val tri = IndexedSeq((100.0, 100.0), (110.0, 100.0), (100.0, 110.0))
    assert(Wkb.clipPolygonConvex(square(0.0, 0.0, 1.0, 1.0), tri) == null)
  }

  test("clipPolygonConvex: diagonal half-plane cuts the square to a triangle") {
    // clip square [0,2]^2 by the triangle under x+y<=2: result is the
    // lower-left triangle (0,0)-(2,0)-(0,2), area 2
    val tri = IndexedSeq((0.0, 0.0), (2.0, 0.0), (0.0, 2.0))
    val c = Wkb.clipPolygonConvex(square(0.0, 0.0, 2.0, 2.0), tri)
    assert(math.abs(Wkb.area(c) - 2.0) < 1e-12)
  }

  test("clipPolygonConvex: inclusion-exclusion union area is consistent") {
    // A = square [0,2]^2 (area 4), B = square [1,1]..[3,3] (area 4),
    // A∩B = [1,2]^2 (area 1) → A∪B = 7
    val a = square(0.0, 0.0, 2.0, 2.0)
    val b = IndexedSeq((1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0))
    val inter = Wkb.clipPolygonConvex(a, b)
    val union = Wkb.area(a) + 4.0 - Wkb.area(inter)
    assert(math.abs(Wkb.area(inter) - 1.0) < 1e-12)
    assert(math.abs(union - 7.0) < 1e-12)
  }

  test("clipPolygonConvex: reflex or CW clip ring is rejected loudly") {
    val cw = IndexedSeq((0.0, 0.0), (0.0, 10.0), (10.0, 0.0)) // CW triangle
    val e = intercept[IllegalArgumentException] {
      Wkb.clipPolygonConvex(square(1.0, 1.0, 2.0, 2.0), cw)
    }
    assert(e.getMessage.contains("reflex/CW"))
  }

  // -------------------------------------------- lineInterpolate (a11ac)
  test("lineInterpolate: endpoints, clamping, exact midpoint, vertex boundary, degenerate") {
    val straight = Wkb.lineString(Seq((0.0, 0.0), (10.0, 0.0)))
    assert(Wkb.lineInterpolate(straight, 0.0) == ((0.0, 0.0)))
    assert(Wkb.lineInterpolate(straight, 1.0) == ((10.0, 0.0)))
    assert(Wkb.lineInterpolate(straight, 0.5) == ((5.0, 0.0)))
    // out-of-range t clamps (the PostGIS contract)
    assert(Wkb.lineInterpolate(straight, -0.3) == ((0.0, 0.0)))
    assert(Wkb.lineInterpolate(straight, 2.0) == ((10.0, 0.0)))
    // L-shape, equal 10-unit arms: t=0.5 is exactly the corner vertex —
    // the covering-segment tie must land on the EARLIER segment and
    // still produce the corner point
    val ell = Wkb.lineString(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0)))
    assert(Wkb.lineInterpolate(ell, 0.5) == ((10.0, 0.0)))
    // t=0.75 is halfway up the second arm
    assert(Wkb.lineInterpolate(ell, 0.75) == ((10.0, 5.0)))
    // all-coincident degenerate: total length 0 → first vertex
    val dot = Wkb.lineString(Seq((3.0, 4.0), (3.0, 4.0)))
    assert(Wkb.lineInterpolate(dot, 0.5) == ((3.0, 4.0)))
    // single vertex
    assert(Wkb.lineInterpolate(Wkb.lineString(Seq((7.0, 8.0))), 0.5) == ((7.0, 8.0)))
    // non-linestring rejected loudly
    val e = intercept[IllegalArgumentException] {
      Wkb.lineInterpolate(Wkb.point(1.0, 2.0), 0.5)
    }
    assert(e.getMessage.contains("LINESTRING"))
  }

  // ------------------------------------------------ bufferSquare (a11y)
  test("bufferSquare: point becomes the [-r,r]^2 square") {
    val b = Wkb.bufferSquare(Wkb.point(3.0, 4.0), 1.5)
    assert(Wkb.geomType(b) == "POLYGON")
    assert(Wkb.bbox(b) == Wkb.BBox(1.5, 2.5, 4.5, 5.5))
    assert(math.abs(Wkb.area(b) - 9.0) < 1e-12)
  }

  test("bufferSquare: diamond becomes the closed-form octagon (exact vertex sums)") {
    val (r, cr) = (15.5, 120.17)
    val (cx, cy) = (50.0, 60.0)
    val d = Wkb.polygon(Seq(Seq(
      (cx + cr, cy), (cx, cy + cr), (cx - cr, cy), (cx, cy - cr), (cx + cr, cy))))
    val b = Wkb.bufferSquare(d, r)
    val ring = Wkb.outerRing(b)
    assert(ring.head == ring.last)
    // 8 distinct vertices + closing dup; exact values = one add each,
    // the same sums the a11y oracle writes
    assert(ring.length == 9)
    val expect = Set(
      (cx - r, (cy - cr) - r), (cx + r, (cy - cr) - r),
      ((cx + cr) + r, cy - r), ((cx + cr) + r, cy + r),
      (cx + r, (cy + cr) + r), (cx - r, (cy + cr) + r),
      ((cx - cr) - r, cy + r), ((cx - cr) - r, cy - r))
    assert(ring.dropRight(1).toSet == expect, "octagon vertices not the exact closed-form sums")
    // Minkowski area identity: A + perimeter·r/... for the L∞ square:
    // area = diamond + 4 side rects (edgeLen·r... ) — just check monotone + bbox
    assert(Wkb.bbox(b) == Wkb.BBox((cx - cr) - r, (cy - cr) - r, (cx + cr) + r, (cy + cr) + r))
  }

  test("bufferSquare: axis-aligned square input fuses collinear edges (minimal ring)") {
    // input edges parallel to square edges → cross = 0 arm advances both:
    // the sum of two axis-aligned squares is a square, 4 vertices, no
    // collinear midpoints
    val b = Wkb.bufferSquare(square(0.0, 0.0, 2.0, 2.0), 1.0)
    val ring = Wkb.outerRing(b)
    assert(ring.length == 5, s"expected minimal 4-vertex ring, got ${ring.length - 1}")
    assert(Wkb.bbox(b) == Wkb.BBox(-1.0, -1.0, 3.0, 3.0))
    assert(math.abs(Wkb.area(b) - 16.0) < 1e-12)
  }

  test("bufferSquare: CW ring is normalized, non-convex and non-areal throw") {
    val cw = Wkb.polygon(Seq(Seq((0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0))))
    assert(math.abs(Wkb.area(Wkb.bufferSquare(cw, 1.0)) - 16.0) < 1e-12)
    val reflex = Wkb.polygon(Seq(Seq(
      (0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (2.0, 1.0), (0.0, 4.0), (0.0, 0.0))))
    val e = intercept[IllegalArgumentException] { Wkb.bufferSquare(reflex, 1.0) }
    assert(e.getMessage.contains("non-convex"))
    intercept[IllegalArgumentException] {
      Wkb.bufferSquare(Wkb.lineString(Seq((0.0, 0.0), (1.0, 1.0))), 1.0)
    }
  }

  // -------------------------------------------------- makeValid (a11ap)
  test("makeValid: rewinds CW outer + CCW holes, closes unclosed rings, idempotent, SRID kept") {
    // CW outer + CCW hole (both wrong): both rings rewind
    val bad = Wkb.setSrid(Wkb.polygon(Seq(
      Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)), // CW outer
      Seq((4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0), (4.0, 4.0)))), 4326) // CCW hole
    val (fixed, rewound, closed) = Wkb.makeValid(bad)
    assert(rewound == 2 && closed == 0, s"($rewound, $closed)")
    assert(Wkb.srid(fixed) == 4326)
    assert(math.abs(Wkb.area(fixed) - 96.0) < 1e-12) // 100 - 4, hole honored
    // outer now CCW: the idempotence probe fires zero repairs
    val (_, r2, c2) = Wkb.makeValid(fixed)
    assert(r2 == 0 && c2 == 0, "makeValid must be idempotent")
    // unclosed CCW outer: one closure repair, no rewind, vertex appended
    val open = Wkb.polygon(Seq(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))))
    val (fx2, r3, c3) = Wkb.makeValid(open)
    assert(r3 == 0 && c3 == 1, s"($r3, $c3)")
    assert(Wkb.ringVertexCounts(fx2) == Seq(5))
    assert(math.abs(Wkb.area(fx2) - 100.0) < 1e-12)
    // already-valid input is byte-stable modulo SRID-less rebuild
    val (fx3, r4, c4) = Wkb.makeValid(fx2)
    assert(r4 == 0 && c4 == 0 && fx3.sameElements(fx2))
    // non-polygon rejects loudly
    intercept[IllegalArgumentException] { Wkb.makeValid(Wkb.point(1.0, 2.0)) }
  }

  // --------------------------------------------- bufferEuclidean (a11ak)
  test("bufferEuclidean: point becomes the inscribed regular 4*segs-gon") {
    val b = Wkb.bufferEuclidean(Wkb.point(3.0, 4.0), 2.0, 8)
    val ring = Wkb.outerRing(b)
    assert(Wkb.geomType(b) == "POLYGON")
    assert(ring.head == ring.last && ring.length == 33, s"got ${ring.length}")
    // first vertex at angle 0: (x + r, y) exactly (cos 0 = 1, sin 0 = 0)
    assert(ring.head == ((5.0, 4.0)))
    // every vertex at distance r (to libm grain)
    ring.dropRight(1).foreach { case (x, y) =>
      assert(math.abs(math.hypot(x - 3.0, y - 4.0) - 2.0) < 1e-12)
    }
    // inscribed regular n-gon area = (n/2)·r²·sin(2π/n), strictly < πr²
    val n = 32
    val expect = n / 2.0 * 4.0 * math.sin(2.0 * math.Pi / n)
    assert(math.abs(Wkb.area(b) - expect) < 1e-9)
    assert(Wkb.area(b) < math.Pi * 4.0)
  }

  test("bufferEuclidean: convex square grows by edge rects + quarter arcs") {
    val b = Wkb.bufferEuclidean(square(0.0, 0.0, 2.0, 2.0), 1.0, 8)
    val ring = Wkb.outerRing(b)
    // 4 corners × (8+1) arc vertices + closing dup
    assert(ring.length == 37, s"got ${ring.length}")
    assert(Wkb.bbox(b) == Wkb.BBox(-1.0, -1.0, 3.0, 3.0))
    // Minkowski area = A + P·r + (inscribed-circle area): 4 + 8·1 + ~π·1²
    // with the arc-polygon deficit πr²(1 − sinc(π/16)) ≈ 0.02
    val a = Wkb.area(b)
    assert(a > 4.0 + 8.0 + math.Pi - 0.03 && a < 4.0 + 8.0 + math.Pi,
      s"area $a outside the inscribed-arc envelope")
    // buffered ring stays distance <= r from the square, >= r at arc vertices
    ring.dropRight(1).foreach { case (x, y) =>
      val dx = math.max(0.0, math.max(-x, x - 2.0))
      val dy = math.max(0.0, math.max(-y, y - 2.0))
      assert(math.hypot(dx, dy) <= 1.0 + 1e-12, s"vertex ($x, $y) beyond r")
    }
  }

  test("bufferEuclidean: segs knob controls arc resolution and area convergence") {
    val d = Wkb.polygon(Seq(Seq(
      (3.0, 0.0), (0.0, 3.0), (-3.0, 0.0), (0.0, -3.0), (3.0, 0.0))))
    val a1 = Wkb.area(Wkb.bufferEuclidean(d, 1.5, 1))
    val a8 = Wkb.area(Wkb.bufferEuclidean(d, 1.5, 8))
    val a64 = Wkb.area(Wkb.bufferEuclidean(d, 1.5, 64))
    // diamond: A = 18, P = 12√2; exact buffer area = A + P·r + πr²
    val exact = 18.0 + 12.0 * math.sqrt(2.0) * 1.5 + math.Pi * 1.5 * 1.5
    assert(a1 < a8 && a8 < a64 && a64 < exact, s"$a1 / $a8 / $a64 vs $exact")
    assert(exact - a64 < 1e-2 && exact - a8 < 0.1, s"deficit ${exact - a8}")
    assert(Wkb.outerRing(Wkb.bufferEuclidean(d, 1.5, 1)).length == 4 * 2 + 1)
  }

  test("bufferEuclidean: CW normalized; reflex, collinear, and non-areal throw") {
    val cw = Wkb.polygon(Seq(Seq((0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0))))
    assert(math.abs(Wkb.area(Wkb.bufferEuclidean(cw, 1.0, 8)) -
      Wkb.area(Wkb.bufferEuclidean(square(0.0, 0.0, 2.0, 2.0), 1.0, 8))) < 1e-12)
    val reflex = Wkb.polygon(Seq(Seq(
      (0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (2.0, 1.0), (0.0, 4.0), (0.0, 0.0))))
    assert(intercept[IllegalArgumentException] {
      Wkb.bufferEuclidean(reflex, 1.0, 8)
    }.getMessage.contains("non-convex"))
    // collinear midpoint: allowed by bufferSquare, rejected here (strict) —
    // the zero-sweep corner would make the fp arc direction ambiguous
    val collinear = Wkb.polygon(Seq(Seq(
      (0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0))))
    assert(intercept[IllegalArgumentException] {
      Wkb.bufferEuclidean(collinear, 1.0, 8)
    }.getMessage.contains("collinear"))
    intercept[IllegalArgumentException] {
      Wkb.bufferEuclidean(Wkb.lineString(Seq((0.0, 0.0), (1.0, 1.0))), 1.0, 8)
    }
    intercept[IllegalArgumentException] { Wkb.bufferEuclidean(cw, -1.0, 8) }
    intercept[IllegalArgumentException] { Wkb.bufferEuclidean(cw, 1.0, 0) }
  }

  // ------------------------------------ a11ai buffered-membership semantics
  test("concave buffer membership: ray cast + boundary distance compose correctly on the L-shape") {
    val l = Wkb.polygon(Seq(Seq(
      (0.0, 0.0), (40.0, 0.0), (40.0, 20.0), (20.0, 20.0), (20.0, 40.0), (0.0, 40.0), (0.0, 0.0))))
    def member(px: Double, py: Double, r: Double): Boolean =
      Wkb.containsPoint(l, px, py) || Wkb.boundaryDistance(l, px, py) <= r
    // deep interior of the thick arm: inside arm fires, distance arm would not
    assert(Wkb.containsPoint(l, 10.0, 10.0))
    assert(Wkb.boundaryDistance(l, 10.0, 10.0) == 10.0)
    assert(member(10.0, 10.0, 6.17))
    // notch interior: outside the polygon (the reflex region) ...
    assert(!Wkb.containsPoint(l, 30.0, 30.0))
    // ... but within r of the notch corner edges at close range
    assert(member(22.0, 25.0, 6.17) && !member(30.0, 30.0, 6.17))
    // inside the notch the nearest feature is always an EDGE, never the
    // reflex corner: min(x - 20, y - 20) — the perpendicular foot stays on
    // both bounding segments for any notch point
    val d = Wkb.boundaryDistance(l, 24.0, 23.0)
    assert(d == 3.0, s"notch edge distance $d")
    // far outside: neither arm
    assert(!member(60.0, 60.0, 6.17))
    // bufferSquare still rejects the reflex ring loudly (the gap a11ai measures around)
    intercept[IllegalArgumentException](Wkb.bufferSquare(l, 6.17))
  }
  // r17 optimization pin: the decode-once ring probes (decodeAreaRings +
  // containsPointRings/boundaryDistanceRings, used by a11ai and the grid
  // joins' RingMemo) must match the streaming per-call walks BIT-FOR-BIT —
  // same doubles, same comparisons, including holes and multipolygons.
  test("ring-decoded probes equal the streaming walks bit-for-bit") {
    val holed = Wkb.polygon(Seq(
      Seq((0.0, 0.0), (40.0, 0.0), (40.0, 20.0), (20.0, 20.0),
        (20.0, 40.0), (0.0, 40.0), (0.0, 0.0)),
      Seq((5.0, 5.0), (10.0, 5.0), (10.0, 10.0), (5.0, 10.0), (5.0, 5.0))))
    val south = Wkb.polygon(Seq(
      Seq((50.0, 50.0), (60.0, 50.0), (55.0, 58.3), (50.0, 50.0))))
    val multi = Wkb.multi(6, Seq(holed, south))
    for (g <- Seq(holed, south, multi)) {
      val rings = Wkb.decodeAreaRings(g)
      var x = -3.1
      while (x < 62.0) {
        var y = -2.7
        while (y < 62.0) {
          assert(Wkb.containsPointRings(rings, x, y) == Wkb.containsPoint(g, x, y),
            s"contains mismatch at ($x, $y)")
          assert(Wkb.boundaryDistanceRings(rings, x, y) == Wkb.boundaryDistance(g, x, y),
            s"distance mismatch at ($x, $y)")
          y += 1.63
        }
        x += 1.37
      }
    }
  }
}

/** Randomized invariants over the geometry predicates: generated convex
  * polygons (sorted angles on an ellipse — always simple and closed) and
  * arbitrary probe points. These pin cross-function consistency the
  * example-based tests can't sweep.
  */
object WkbProps extends Properties("Wkb") {

  private val coord = Gen.chooseNum(-1000.0, 1000.0)
    .map(v => math.rint(v * 100) / 100) // 0.01 grid keeps probes off edges

  private val convexPoly: Gen[Array[Byte]] = for {
    cx <- coord; cy <- coord
    rx <- Gen.chooseNum(1.0, 300.0); ry <- Gen.chooseNum(1.0, 300.0)
    k <- Gen.chooseNum(3, 12)
    offset <- Gen.chooseNum(0.0, math.Pi / 3)
  } yield {
    val ring = (0 until k).map { i =>
      val a = offset + 2 * math.Pi * i / k
      (cx + rx * math.cos(a), cy + ry * math.sin(a))
    }
    Wkb.polygon(Seq(ring :+ ring.head))
  }

  property("containsPoint implies inside the bbox") = Prop.forAll(
    convexPoly, coord, coord) { (p, px, py) =>
    !Wkb.containsPoint(p, px, py) || Wkb.bboxIntersects(p, px, py, px, py)
  }

  property("bbox-disjoint point is never contained") = Prop.forAll(
    convexPoly, coord, coord) { (p, px, py) =>
    Wkb.bboxIntersects(p, px, py, px, py) || !Wkb.containsPoint(p, px, py)
  }

  property("intersects is symmetric") = Prop.forAll(convexPoly, convexPoly) { (a, b) =>
    Wkb.intersects(a, b) == Wkb.intersects(b, a)
  }

  property("every polygon intersects itself") = Prop.forAll(convexPoly) { p =>
    Wkb.intersects(p, p)
  }

  property("shared contained point implies intersects") = Prop.forAll(
    convexPoly, convexPoly, coord, coord) { (a, b, px, py) =>
    !(Wkb.containsPoint(a, px, py) && Wkb.containsPoint(b, px, py)) || Wkb.intersects(a, b)
  }

  property("area is positive and bounded by the bbox area") = Prop.forAll(convexPoly) { p =>
    val bb = Wkb.bbox(p)
    val a = Wkb.area(p)
    a > 0 && a <= (bb.xmax - bb.xmin) * (bb.ymax - bb.ymin) + 1e-9
  }

  property("vertex centroid of a convex polygon is contained") = Prop.forAll(convexPoly) { p =>
    val bb = Wkb.bbox(p)
    // for the symmetric ellipse construction the bbox center is interior
    Wkb.containsPoint(p, (bb.xmin + bb.xmax) / 2, (bb.ymin + bb.ymax) / 2)
  }

  // ----------------------------------------------------------------- WKT
  private val anyPoint: Gen[Array[Byte]] =
    for { x <- coord; y <- coord } yield Wkb.point(x, y)

  private val anyLine: Gen[Array[Byte]] =
    Gen.nonEmptyListOf(Gen.zip(coord, coord)).map(pts => Wkb.lineString(pts))

  private val anyGeom: Gen[Array[Byte]] = Gen.oneOf(
    anyPoint, anyLine, convexPoly,
    Gen.nonEmptyListOf(Gen.zip(coord, coord))
      .map(pts => Wkb.multi(4, pts.map { case (x, y) => Wkb.point(x, y) })),
    Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.zip(coord, coord)))
      .map(ls => Wkb.multi(5, ls.map(Wkb.lineString(_)))),
    Gen.nonEmptyListOf(convexPoly).map(ps => Wkb.multi(6, ps)))

  property("fromWkt(toWkt(g)) is byte-identical for canonical WKB") =
    Prop.forAll(anyGeom) { g =>
      java.util.Arrays.equals(Wkb.fromWkt(Wkb.toWkt(g)), g)
    }

  property("toWkt survives a second roundtrip unchanged") =
    Prop.forAll(anyGeom) { g =>
      val w = Wkb.toWkt(g)
      Wkb.toWkt(Wkb.fromWkt(w)) == w
    }

  property("geometry collections roundtrip recursively") =
    Prop.forAll(Gen.nonEmptyListOf(anyGeom)) { gs =>
      val gc = Wkb.multi(7, gs)
      java.util.Arrays.equals(Wkb.fromWkt(Wkb.toWkt(gc)), gc)
    }

  property("fromWkt on arbitrary text: parses or throws IAE, never anything else") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      try { Wkb.fromWkt(s); true }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    }

  property("simplify keeps endpoints and never lengthens") = Prop.forAll(
    Gen.nonEmptyListOf(Gen.zip(coord, coord)), Gen.chooseNum(0.01, 50.0)) { (pts, eps) =>
    val line = Wkb.lineString(pts)
    val simp = Wkb.simplify(line, eps)
    // at huge epsilon only the endpoints survive (shorter lines pass through)
    val huge = Wkb.simplify(line, 1e12)
    val expectHuge =
      if (pts.length < 3) Wkb.lineString(pts)
      else Wkb.lineString(Seq(pts.head, pts.last))
    java.util.Arrays.equals(huge, expectHuge) &&
      Wkb.length(simp) <= Wkb.length(line) + 1e-9
  }

  property("UTM forward∘inverse roundtrips under 1e-9° across zones and hemispheres") =
    Prop.forAll(
      Gen.chooseNum(-179.99, 179.99), Gen.chooseNum(-84.0, 84.0),
      Gen.chooseNum(1, 60), Gen.oneOf(true, false)) { (lon0, lat, zone, south) =>
      // offset lon into the chosen zone's ±3° band (the series is valid
      // beyond it, but UTM use stays in-zone)
      val lon = (zone * 6.0 - 183.0) + (lon0 % 3.0)
      val (e, n) = Wkb.lonLatToUtm(lon, lat, zone, south)
      val (lo, la) = Wkb.utmToLonLat(e, n, zone, south)
      // easting stays inside the zone envelope; northing offset applied south
      val eOk = e > 100000.0 && e < 900000.0
      val nOk = if (south) n >= 0.0 && n <= 2.0e7 else math.abs(n) < 1.0e7
      eOk && nOk && math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9
    }

}

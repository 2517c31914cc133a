package graft.functions

import org.scalatest.funsuite.AnyFunSuite
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

  test("EWKB-style flag bits in the type word are masked") {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(0x20000001).putDouble(1.0).putDouble(2.0) // SRID-flagged point
    assert(Wkb.geomType(bb.array()) == "POINT")
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
}

package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-Scala WKB (Well-Known Binary) codec (SURVEY.md §2 A11).
  *
  * The reference transports geometries as opaque WKB bytes inside each
  * feature message [UPSTREAM-UNVERIFIED — empty checkout, SURVEY.md §0];
  * the engine keeps them opaque `BinaryType` columns and offers scalar
  * helpers (`geomType`, `bbox`, `bboxIntersects`) implemented here. No
  * JTS/Sedona jar exists in this image, so the codec is written from the
  * public OGC WKB spec: byte order flag, uint32 geometry type, coordinate
  * doubles. Supported: Point(1), LineString(2), Polygon(3) with any number
  * of rings, MultiPoint(4), MultiLineString(5), MultiPolygon(6) and
  * GeometryCollection(7) (recursive — every member carries its own byte
  * order flag per spec), both endiannesses.
  */
object Wkb {

  final case class BBox(xmin: Double, ymin: Double, xmax: Double, ymax: Double)

  def point(x: Double, y: Double): Array[Byte] = {
    val bb = ByteBuffer.allocate(21).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    bb.array()
  }

  def lineString(pts: Seq[(Double, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(9 + 16 * pts.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(2).putInt(pts.length)
    pts.foreach { case (x, y) => bb.putDouble(x).putDouble(y) }
    bb.array()
  }

  /** Single- or multi-ring polygon; each ring must be closed by the caller. */
  def polygon(rings: Seq[Seq[(Double, Double)]]): Array[Byte] = {
    val n = rings.map(_.length).sum
    // header = order(1) + type(4) + numRings(4); trailing slack bytes would
    // desynchronize the reader when this value is embedded in a collection
    val bb = ByteBuffer.allocate(9 + 4 * rings.length + 16 * n).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(3).putInt(rings.length)
    rings.foreach { ring =>
      bb.putInt(ring.length)
      ring.foreach { case (x, y) => bb.putDouble(x).putDouble(y) }
    }
    bb.array()
  }

  /** A multi-geometry / collection envelope: each member is a complete
    * WKB value (own byte-order flag), per the OGC spec.
    */
  def multi(gtype: Int, members: Seq[Array[Byte]]): Array[Byte] = {
    require(gtype >= 4 && gtype <= 7, s"not a collection type: $gtype")
    val bb = ByteBuffer.allocate(9 + members.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(gtype).putInt(members.length)
    members.foreach(bb.put)
    bb.array()
  }

  // reads the byte-order flag and masked base type, setting bb's order
  private def header(bb: ByteBuffer): Int = {
    bb.order(if (bb.get() == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    // mask Z/M/SRID flags (EWKB-style high bits) down to the base 2D type
    bb.getInt & 0xff
  }

  def geomType(wkb: Array[Byte]): String = header(ByteBuffer.wrap(wkb)) match {
    case 1 => "POINT"
    case 2 => "LINESTRING"
    case 3 => "POLYGON"
    case 4 => "MULTIPOINT"
    case 5 => "MULTILINESTRING"
    case 6 => "MULTIPOLYGON"
    case 7 => "GEOMETRYCOLLECTION"
    case t => s"UNKNOWN($t)"
  }

  def bbox(wkb: Array[Byte]): BBox = {
    val bb = ByteBuffer.wrap(wkb)
    var xmin = Double.PositiveInfinity
    var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity
    var ymax = Double.NegativeInfinity
    def coords(n: Int): Unit = {
      var i = 0
      while (i < n) {
        val x = bb.getDouble; val y = bb.getDouble
        if (x < xmin) xmin = x
        if (x > xmax) xmax = x
        if (y < ymin) ymin = y
        if (y > ymax) ymax = y
        i += 1
      }
    }
    def geom(): Unit = header(bb) match {
      case 1 => coords(1)
      case 2 => coords(bb.getInt)
      case 3 =>
        val rings = bb.getInt
        var r = 0
        while (r < rings) { coords(bb.getInt); r += 1 }
      case t if t >= 4 && t <= 7 =>
        // every collection member restates its own byte order
        val n = bb.getInt
        var i = 0
        while (i < n) { geom(); i += 1 }
      case t => throw new IllegalArgumentException(s"wkb: unsupported geometry type $t")
    }
    geom()
    BBox(xmin, ymin, xmax, ymax)
  }

  def bboxIntersects(wkb: Array[Byte], xmin: Double, ymin: Double, xmax: Double, ymax: Double): Boolean = {
    val b = bbox(wkb)
    b.xmin <= xmax && b.xmax >= xmin && b.ymin <= ymax && b.ymax >= ymin
  }
}

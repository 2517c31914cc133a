package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.Wkb
import Kml.{KLine, KMulti, KPoint, KPolygon}

class KmlSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  test("writeKml → splitPlacemarks → parse roundtrips points exactly (IEEE doubles)") {
    val rows = Seq(
      ("p1", Map("ETYPE" -> "view"), KPoint(11.5, 48.1)),
      ("p2", Map("ETYPE" -> "click"), KPoint(-180.0, -90.0)),
      ("p3", Map("ETYPE" -> "buy"), KPoint(1e-300, 2.5)))
    val doc = Kml.writeKml(rows)
    val blocks = Kml.splitPlacemarks(doc)
    assert(blocks.length == 3)
    blocks.zip(rows).foreach { case (b, (fid, props, KPoint(x, y))) =>
      assert(Kml.parseId(b) == fid)
      assert(Kml.parseProps(b) == props)
      val wkb = Kml.parseGeometry(b)
      assert(Wkb.geomType(wkb) == "POINT")
      assert(Wkb.bbox(wkb) == Wkb.BBox(x, y, x, y), s"coords not bit-exact for $fid")
    }
  }

  test("linestring, polygon with hole, and MultiGeometry parse to the right WKB") {
    val line = KLine(Seq((0.0, 0.0), (3.0, 4.0), (5.5, 4.0)))
    val poly = KPolygon(Seq(
      Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)),
      Seq((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0))))
    val multi = KMulti(Seq(KPoint(1.0, 2.0), KPoint(3.0, 4.0)))
    val doc = Kml.writeKml(Seq(
      ("l", Map.empty[String, String], line),
      ("pg", Map.empty[String, String], poly),
      ("m", Map.empty[String, String], multi)))
    val Array(bl, bp, bm) = Kml.splitPlacemarks(doc)
    assert(Wkb.geomType(Kml.parseGeometry(bl)) == "LINESTRING")
    val pw = Kml.parseGeometry(bp)
    assert(Wkb.geomType(pw) == "POLYGON")
    assert(Wkb.ringVertexCounts(pw) == Seq(5, 5), "hole ring lost")
    // interior of the hole is OUTSIDE the polygon
    assert(!Wkb.containsPoint(pw, 3.0, 3.0))
    assert(Wkb.containsPoint(pw, 7.0, 7.0))
    val mw = Kml.parseGeometry(bm)
    assert(Wkb.geomType(mw) == "MULTIPOINT")
  }

  test("altitude carries: lon,lat,alt tuples become Z WKB; absent alt in a mixed string = 0 (KML default)") {
    def tw(wkb: Array[Byte]): Int =
      java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(1)
    val pz = Kml.parseGeometry("<Point><coordinates>1.5,2.5,100.25</coordinates></Point>")
    assert(tw(pz) == 1001 && Wkb.bbox(pz) == Wkb.BBox(1.5, 2.5, 1.5, 2.5))
    val lz = Kml.parseGeometry(
      "<LineString><coordinates>0,0,5 1,1,6</coordinates></LineString>")
    assert(tw(lz) == 1002 && Wkb.length(lz) == math.sqrt(2.0))
    // mixed tuples: KML's default altitude is 0 (clampToGround), so the
    // alt-less tuple pads rather than refusing
    val lm = Kml.parseGeometry(
      "<LineString><coordinates>0,0,5 1,1</coordinates></LineString>")
    assert(tw(lm) == 1002)
    // an all-2D string stays byte-identical plain WKB
    val l2 = Kml.parseGeometry(
      "<LineString><coordinates>0,0 1,1</coordinates></LineString>")
    assert(tw(l2) == 2)
    // >3 components refuse loudly
    val e = intercept[IllegalArgumentException] {
      Kml.parseGeometry("<Point><coordinates>1,2,3,4</coordinates></Point>")
    }
    assert(e.getMessage.contains("components"), e.getMessage)
  }

  test("XML entities roundtrip in ids and props; foreign SimpleData/name parse") {
    val doc = Kml.writeKml(Seq(
      ("a&b<c>", Map("K\"1" -> "v'1 & more"), KPoint(1.0, 1.0))))
    val b = Kml.splitPlacemarks(doc).head
    assert(Kml.parseId(b) == "a&b<c>")
    assert(Kml.parseProps(b) == Map("K\"1" -> "v'1 & more"))
    // a hand-written (foreign-style) placemark: SchemaData/SimpleData + name
    val foreign =
      """<Placemark id="f1"><name>  Munich </name>
        |<ExtendedData><SchemaData schemaUrl="#s">
        |<SimpleData name="POP">1500000</SimpleData>
        |</SchemaData></ExtendedData>
        |<Point><coordinates>11.5,48.1,512.0</coordinates></Point></Placemark>""".stripMargin
    assert(Kml.parseProps(foreign) == Map("POP" -> "1500000", "name" -> "Munich"))
    val w = Kml.parseGeometry(foreign) // altitude dropped: 2D engine
    assert(Wkb.bbox(w) == Wkb.BBox(11.5, 48.1, 11.5, 48.1))
  }

  test("splitPlacemarks skips comments and handles documents without placemarks") {
    val doc =
      """<?xml version="1.0"?><kml><Document>
        |<!-- <Placemark id="ghost"><Point><coordinates>0,0</coordinates></Point></Placemark> -->
        |<Placemark id="real"><Point><coordinates>1,2</coordinates></Point></Placemark>
        |</Document></kml>""".stripMargin
    val blocks = Kml.splitPlacemarks(doc)
    assert(blocks.length == 1)
    assert(Kml.parseId(blocks(0)) == "real")
    assert(Kml.splitPlacemarks("<kml><Document/></kml>").isEmpty)
  }

  test("read: KML file becomes canonical feature envelopes") {
    val dir = Files.createTempDirectory("kml").toString
    val doc = Kml.writeKml(Seq(
      ("m1", Map("NAME" -> "munich"), KPoint(11.5, 48.1)),
      ("md1", Map("NAME" -> "madrid"), KPoint(-3.5, 40.4))))
    Files.writeString(java.nio.file.Paths.get(s"$dir/cities.kml"), doc)
    val rows = Kml.read(spark, s"$dir/cities.kml", "poi", eventTsUs = 1000000L).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("layer")).toSet == Set("poi"))
    val m = rows.find(_.getAs[String]("feature_id") == "m1").get
    assert(Wkb.bbox(m.getAs[Array[Byte]]("geom_wkb")) == Wkb.BBox(11.5, 48.1, 11.5, 48.1))
    assert(m.getAs[Map[String, String]]("props") == Map("NAME" -> "munich"))
    assert(m.getAs[java.sql.Timestamp]("event_ts").getTime == 1000L)
    assert(m.getAs[String]("source").endsWith("cities.kml"))
    assert(m.getAs[Int]("fmt_version") == 1)
  }
}

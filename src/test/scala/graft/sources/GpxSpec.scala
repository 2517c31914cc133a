package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.Wkb

class GpxSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  test("writeGpxWaypoints → splitFeatures → parse roundtrips points exactly (IEEE doubles)") {
    val rows = Seq(
      ("w1", Map("type" -> "view"), Kml.KPoint(11.5, 48.1)),
      ("w2", Map("type" -> "click"), Kml.KPoint(-180.0, -90.0)),
      ("w3", Map("type" -> "buy", "desc" -> "x & y"), Kml.KPoint(1e-300, 2.5)))
    val doc = Gpx.writeGpxWaypoints(rows)
    val blocks = Gpx.splitFeatures(doc)
    assert(blocks.length == 3)
    blocks.zip(rows).foreach { case (b, (fid, props, Kml.KPoint(x, y))) =>
      val p = Gpx.parseProps(b)
      assert(p("name") == fid)
      props.foreach { case (k, v) => assert(p(k) == v, s"prop $k") }
      val wkb = Gpx.parseGeometry(b)
      assert(Wkb.geomType(wkb) == "POINT")
      assert(Wkb.bbox(wkb) == Wkb.BBox(x, y, x, y), s"coords not bit-exact for $fid")
    }
  }

  test("lat/lon are attributes in (lat, lon) order; attribute order in the file is irrelevant") {
    // hand-written foreign block with the attributes REVERSED vs our writer
    val b = """<wpt lon="11.5" lat="48.1"><name>m</name></wpt>"""
    val wkb = Gpx.parseGeometry(b)
    // x = lon = 11.5, y = lat = 48.1 — a transposed parse would flip these
    assert(Wkb.bbox(wkb) == Wkb.BBox(11.5, 48.1, 11.5, 48.1))
  }

  test("single-segment trk parses to LINESTRING, multi-segment to MULTILINESTRING") {
    val one = Gpx.writeGpxTracks(Seq(
      ("t1", Map("type" -> "hike"), Seq(Seq((0.0, 0.0), (1.0, 1.0), (2.0, 1.5))))))
    val b1 = Gpx.splitFeatures(one).head
    assert(Wkb.geomType(Gpx.parseGeometry(b1)) == "LINESTRING")
    assert(Gpx.parseProps(b1) == Map("name" -> "t1", "type" -> "hike"))
    val two = Gpx.writeGpxTracks(Seq(
      ("t2", Map.empty[String, String],
        Seq(Seq((0.0, 0.0), (1.0, 0.0)), Seq((5.0, 5.0), (6.0, 5.0), (7.0, 6.0))))))
    val b2 = Gpx.splitFeatures(two).head
    val w2 = Gpx.parseGeometry(b2)
    assert(Wkb.geomType(w2) == "MULTILINESTRING")
    assert(Wkb.bbox(w2) == Wkb.BBox(0.0, 0.0, 7.0, 6.0))
  }

  test("rte parses to LINESTRING; self-closing wpt yields a point with no props") {
    val doc =
      """<?xml version="1.0"?><gpx version="1.1">
        |<rte><name>r1</name><rtept lat="1" lon="2"/><rtept lat="3" lon="4"/></rte>
        |<wpt lat="9.5" lon="-3.25"/>
        |</gpx>""".stripMargin
    val blocks = Gpx.splitFeatures(doc)
    assert(blocks.length == 2)
    val r = Gpx.parseGeometry(blocks(0))
    assert(Wkb.geomType(r) == "LINESTRING")
    assert(Wkb.bbox(r) == Wkb.BBox(2.0, 1.0, 4.0, 3.0))
    assert(Wkb.bbox(Gpx.parseGeometry(blocks(1))) == Wkb.BBox(-3.25, 9.5, -3.25, 9.5))
    assert(Gpx.parseProps(blocks(1)).isEmpty)
  }

  test("elevation carries: all-ele chains are Z WKB, a mixed chain stays 2D (unknown is not 0)") {
    def tw(wkb: Array[Byte]): Int =
      java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(1)
    val doc =
      """<?xml version="1.0"?><gpx version="1.1">
        |<wpt lat="2.5" lon="1.5"><ele>100.25</ele></wpt>
        |<trk><trkseg><trkpt lat="0" lon="0"><ele>5</ele></trkpt>
        |<trkpt lat="1" lon="1"><ele>6</ele></trkpt></trkseg></trk>
        |<trk><trkseg><trkpt lat="0" lon="0"><ele>5</ele></trkpt>
        |<trkpt lat="1" lon="1"/></trkseg></trk>
        |</gpx>""".stripMargin
    val blocks = Gpx.splitFeatures(doc)
    assert(blocks.length == 3)
    val pz = Gpx.parseGeometry(blocks(0))
    assert(tw(pz) == 1001 && Wkb.bbox(pz) == Wkb.BBox(1.5, 2.5, 1.5, 2.5))
    val tz = Gpx.parseGeometry(blocks(1))
    assert(tw(tz) == 1002 && Wkb.length(tz) == math.sqrt(2.0))
    // GPS dropout: one point without <ele> — the chain stays plain 2D
    // (absent elevation means UNKNOWN, and unknown is not sea level)
    assert(tw(Gpx.parseGeometry(blocks(2))) == 2)
  }

  test("comments are skipped; entities roundtrip; extensions become props") {
    val doc =
      """<gpx><!-- <wpt lat="0" lon="0"><name>ghost</name></wpt> -->
        |<wpt lat="1" lon="2"><name>a&amp;b</name><desc>x &lt; y</desc>
        |<extensions><speed>4.25</speed><device>unit &quot;7&quot;</device></extensions>
        |</wpt></gpx>""".stripMargin
    val blocks = Gpx.splitFeatures(doc)
    assert(blocks.length == 1)
    val p = Gpx.parseProps(blocks.head)
    assert(p == Map("name" -> "a&b", "desc" -> "x < y",
      "speed" -> "4.25", "device" -> "unit \"7\""))
  }

  test("read: GPX file becomes canonical feature envelopes") {
    val dir = Files.createTempDirectory("gpx").toString
    val doc = Gpx.writeGpxWaypoints(Seq(
      ("m1", Map("type" -> "poi"), Kml.KPoint(11.5, 48.1)),
      ("md1", Map("type" -> "poi"), Kml.KPoint(-3.5, 40.4))))
    Files.writeString(java.nio.file.Paths.get(s"$dir/pts.gpx"), doc)
    val rows = Gpx.read(spark, s"$dir/pts.gpx", "poi", eventTsUs = 1000000L).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("layer")).toSet == Set("poi"))
    val m = rows.find(_.getAs[String]("feature_id") == "m1").get
    assert(Wkb.bbox(m.getAs[Array[Byte]]("geom_wkb")) == Wkb.BBox(11.5, 48.1, 11.5, 48.1))
    assert(m.getAs[Map[String, String]]("props") == Map("name" -> "m1", "type" -> "poi"))
    assert(m.getAs[java.sql.Timestamp]("event_ts").getTime == 1000L)
    assert(m.getAs[String]("source").endsWith("pts.gpx"))
  }
}

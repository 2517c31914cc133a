package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.Wkb
import Kml.{KLine, KMulti, KPoint, KPolygon}

class GmlSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  test("writeGml → stripPrefixes → splitMembers → parse roundtrips points exactly") {
    val rows = Seq(
      ("g1", Map("ETYPE" -> "view"), KPoint(11.5, 48.1)),
      ("g2", Map("ETYPE" -> "click"), KPoint(-180.0, -90.0)),
      ("g3", Map("ETYPE" -> "buy"), KPoint(1e-300, 2.5)))
    val doc = Gml.stripPrefixes(Gml.writeGml("events", rows))
    val blocks = Gml.splitMembers(doc)
    assert(blocks.length == 3)
    blocks.zip(rows).foreach { case (b, (fid, props, KPoint(x, y))) =>
      assert(Gml.parseId(b) == fid)
      assert(Gml.parseProps(b) == props)
      val wkb = Gml.parseGeometry(b)
      assert(Wkb.geomType(wkb) == "POINT")
      assert(Wkb.bbox(wkb) == Wkb.BBox(x, y, x, y), s"coords not bit-exact for $fid")
    }
  }

  test("posList is flattened x-y pairs: line, polygon with hole, multi parse to WKB") {
    val line = KLine(Seq((0.0, 0.0), (3.0, 4.0), (5.5, 4.0)))
    val poly = KPolygon(Seq(
      Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)),
      Seq((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0))))
    val multi = KMulti(Seq(KPoint(1.0, 2.0), KPoint(3.0, 4.0)))
    val doc = Gml.stripPrefixes(Gml.writeGml("f", Seq(
      ("l", Map.empty[String, String], line),
      ("pg", Map.empty[String, String], poly),
      ("m", Map.empty[String, String], multi))))
    val Array(bl, bp, bm) = Gml.splitMembers(doc)
    assert(Wkb.geomType(Gml.parseGeometry(bl)) == "LINESTRING")
    val pw = Gml.parseGeometry(bp)
    assert(Wkb.geomType(pw) == "POLYGON")
    assert(Wkb.ringVertexCounts(pw) == Seq(5, 5), "interior ring lost")
    assert(!Wkb.containsPoint(pw, 3.0, 3.0))
    assert(Wkb.containsPoint(pw, 7.0, 7.0))
    assert(Wkb.geomType(Gml.parseGeometry(bm)) == "MULTIPOINT")
  }

  test("odd posList ordinate count fails loudly (never silently drops an ordinate)") {
    val e = intercept[IllegalArgumentException] {
      Gml.parsePosList("1.0 2.0 3.0")
    }
    assert(e.getMessage.contains("not a multiple of srsDimension"))
  }

  test("srsDimension=3: Z ordinates carry into ISO WKB; mixed-dimension rings refuse") {
    def tw(wkb: Array[Byte]): Int =
      java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(1)
    val p = Gml.parseGeometry(
      """<Point><pos srsDimension="3">1.5 2.5 100.25</pos></Point>""")
    assert(tw(p) == 1001 && Wkb.bbox(p) == Wkb.BBox(1.5, 2.5, 1.5, 2.5))
    val l = Gml.parseGeometry(
      """<LineString><posList srsDimension="3">0 0 5 1 1 6</posList></LineString>""")
    assert(tw(l) == 1002 && Wkb.length(l) == math.sqrt(2.0))
    // a 6-token 2D list still parses as 3 points (default dimension)
    val l2 = Gml.parseGeometry(
      """<LineString><posList>0 0 1 1 2 2</posList></LineString>""")
    assert(tw(l2) == 2 && Wkb.length(l2) == 2 * math.sqrt(2.0))
    // 3D shell with a 2D hole refuses loudly
    val e = intercept[IllegalArgumentException] {
      Gml.parseGeometry(
        """<Polygon><exterior><posList srsDimension="3">0 0 1 9 0 1 9 9 1 0 0 1</posList></exterior>""" +
        """<interior><posList>2 2 3 2 3 3 2 2</posList></interior></Polygon>""")
    }
    assert(e.getMessage.contains("mix"), e.getMessage)
  }

  test("prefix stripping handles foreign prefixes, attributes survive, entities roundtrip") {
    val rows = Seq(("a&b<c>", Map("K1" -> "v'1 & more"), KPoint(1.0, 1.0)))
    val b = Gml.splitMembers(Gml.stripPrefixes(Gml.writeGml("events", rows))).head
    assert(Gml.parseId(b) == "a&b<c>")
    assert(Gml.parseProps(b) == Map("K1" -> "v'1 & more"))
    // a hand-written WFS-style member with a different app prefix and an
    // unprefixed id attribute
    val foreign = Gml.stripPrefixes(
      """<wfs:featureMember><topp:states id="s7">
        |<topp:STATE_NAME>Utah</topp:STATE_NAME>
        |<topp:the_geom><gml:Point><gml:pos>-111.7 39.5</gml:pos></gml:Point></topp:the_geom>
        |</topp:states></wfs:featureMember>""".stripMargin)
    val blocks = Gml.splitMembers(foreign)
    assert(blocks.length == 1)
    assert(Gml.parseId(blocks(0)) == "s7")
    assert(Gml.parseProps(blocks(0)) == Map("STATE_NAME" -> "Utah"))
    assert(Wkb.bbox(Gml.parseGeometry(blocks(0))) == Wkb.BBox(-111.7, 39.5, -111.7, 39.5))
  }

  test("splitMembers skips comments; empty collections parse to nothing") {
    val doc = Gml.stripPrefixes(
      """<?xml version="1.0"?><gml:FeatureCollection>
        |<!-- <gml:featureMember><app:x gml:id="ghost"/></gml:featureMember> -->
        |<gml:featureMember><app:x gml:id="real">
        |<app:geom><gml:Point><gml:pos>1 2</gml:pos></gml:Point></app:geom>
        |</app:x></gml:featureMember>
        |</gml:FeatureCollection>""".stripMargin)
    val blocks = Gml.splitMembers(doc)
    assert(blocks.length == 1)
    assert(Gml.parseId(blocks(0)) == "real")
    assert(Gml.splitMembers(Gml.stripPrefixes("<gml:FeatureCollection/>")).isEmpty)
  }

  test("read: GML file becomes canonical feature envelopes") {
    val dir = Files.createTempDirectory("gml").toString
    val doc = Gml.writeGml("poi", Seq(
      ("m1", Map("NAME" -> "munich"), KPoint(11.5, 48.1)),
      ("md1", Map("NAME" -> "madrid"), KPoint(-3.5, 40.4))))
    Files.writeString(java.nio.file.Paths.get(s"$dir/cities.gml"), doc)
    val rows = Gml.read(spark, s"$dir/cities.gml", "poi", eventTsUs = 1000000L).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("layer")).toSet == Set("poi"))
    val m = rows.find(_.getAs[String]("feature_id") == "m1").get
    assert(Wkb.bbox(m.getAs[Array[Byte]]("geom_wkb")) == Wkb.BBox(11.5, 48.1, 11.5, 48.1))
    assert(m.getAs[Map[String, String]]("props") == Map("NAME" -> "munich"))
    assert(m.getAs[java.sql.Timestamp]("event_ts").getTime == 1000L)
    assert(m.getAs[String]("source").endsWith("cities.gml"))
    assert(m.getAs[Int]("fmt_version") == 1)
  }
}

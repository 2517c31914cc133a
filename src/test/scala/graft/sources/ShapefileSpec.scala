package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.Wkb
import Shapefile.{PointS, PolyLineS, PolygonS}

class ShapefileSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  test("writeShp → parseShp roundtrips points exactly (IEEE doubles)") {
    val pts = Seq(PointS(11.5, 48.1), PointS(-180.0, -90.0), PointS(1e-300, 2.5))
    val parsed = Shapefile.parseShp(Shapefile.writeShp(pts))
    assert(parsed.map(_._1) == Seq(1, 2, 3), "record numbers are 1-based and ordered")
    parsed.zip(pts).foreach { case ((_, wkb), PointS(x, y)) =>
      assert(Wkb.geomType(wkb) == "POINT")
      assert(Wkb.bbox(wkb) == Wkb.BBox(x, y, x, y))
    }
  }

  test("writeShp → parseShp: polylines (single + multi-part) and polygon with hole") {
    val single = PolyLineS(Seq(Seq((0.0, 0.0), (3.0, 4.0))))
    val multi = PolyLineS(Seq(Seq((0.0, 0.0), (1.0, 1.0)), Seq((2.0, 2.0), (3.25, 3.0))))
    val lines = Shapefile.parseShp(Shapefile.writeShp(Seq(single, multi)))
    assert(Wkb.geomType(lines(0)._2) == "LINESTRING")
    assert(Wkb.geomType(lines(1)._2) == "MULTILINESTRING")
    assert(Wkb.bbox(lines(1)._2) == Wkb.BBox(0, 0, 3.25, 3))

    val poly = PolygonS(Seq(
      Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)),
      Seq((1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0))))
    val Seq((_, pw)) = Shapefile.parseShp(Shapefile.writeShp(Seq(poly)))
    assert(Wkb.geomType(pw) == "POLYGON")
    assert(Wkb.area(pw) == 16.0 - 1.0, "hole ring subtracts from the area")
  }

  test("writeDbf → parseDbf roundtrips trimmed char attributes; deleted rows skipped") {
    val fields = Seq(("ID", 8), ("NAME", 12))
    val rows = Seq(Seq("7", "munich"), Seq("8", "a b c"), Seq("9", ""))
    val bytes = Shapefile.writeDbf(fields, rows)
    val (names, got) = Shapefile.parseDbf(bytes)
    assert(names == Seq("ID", "NAME"))
    assert(got == rows)
    // flip row 1's deletion flag ('*') in place: header 32+32*2+1 bytes
    val headerSize = 32 + 32 * 2 + 1
    bytes(headerSize + (1 + 8 + 12)) = '*'
    assert(Shapefile.parseDbf(bytes)._2 == Seq(rows(0), rows(2)))
  }

  test("read: .shp/.dbf pair becomes canonical feature envelopes") {
    val dir = Files.createTempDirectory("shp").toString
    val shapes = Seq(PointS(11.5, 48.1), PointS(-3.5, 40.4))
    Files.write(Paths.get(s"$dir/cities.shp"), Shapefile.writeShp(shapes))
    Files.write(Paths.get(s"$dir/cities.dbf"), Shapefile.writeDbf(
      Seq(("ID", 8), ("NAME", 12)), Seq(Seq("m1", "munich"), Seq("md1", "madrid"))))
    val rows = Shapefile.read(spark, s"$dir/cities.shp", "poi", "ID", 1000000L).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("layer")).toSet == Set("poi"))
    val m = rows.find(_.getAs[String]("feature_id") == "m1").get
    assert(Wkb.bbox(m.getAs[Array[Byte]]("geom_wkb")) == Wkb.BBox(11.5, 48.1, 11.5, 48.1))
    assert(m.getAs[Map[String, String]]("props") == Map("ID" -> "m1", "NAME" -> "munich"))
    assert(m.getAs[java.sql.Timestamp]("event_ts").getTime == 1000L)
    assert(m.getAs[String]("source").endsWith("cities.shp"))
    assert(m.getAs[Int]("fmt_version") == 1)
  }

  test("fixture writers refuse to collect above the driver row cap") {
    // VERDICT r10 #4: the .shp/.gpkg fixture writers collect events to the
    // driver; above the cap they must fail loudly, not OOM, so a larger-sf
    // run can't turn a test fixture into a driver crash.
    val e = intercept[IllegalStateException] {
      graft.operators.TierA.guardFixtureRows(spark, SparkFixture.sfDir, "shp", cap = 5L)
    }
    assert(e.getMessage.contains("refuses to collect"))
    // at the default cap the verify-scale table passes untouched
    graft.operators.TierA.guardFixtureRows(spark, SparkFixture.sfDir, "shp")
  }
}

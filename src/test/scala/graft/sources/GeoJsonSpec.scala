package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.Wkb

class GeoJsonSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  test("coordsToWkb: every GeoJSON geometry type maps to the right WKB") {
    assert(Wkb.geomType(GeoJson.coordsToWkb("Point", "[1.5, -2.5]")) == "POINT")
    assert(Wkb.bbox(GeoJson.coordsToWkb("Point", "[1.5, -2.5]")) == Wkb.BBox(1.5, -2.5, 1.5, -2.5))
    val ls = GeoJson.coordsToWkb("LineString", "[[0,0],[3,4]]")
    assert(Wkb.geomType(ls) == "LINESTRING" && Wkb.bbox(ls) == Wkb.BBox(0, 0, 3, 4))
    val poly = GeoJson.coordsToWkb("Polygon", "[[[0,0],[2,0],[2,2],[0,0]]]")
    assert(Wkb.geomType(poly) == "POLYGON" && Wkb.bbox(poly) == Wkb.BBox(0, 0, 2, 2))
    val mp = GeoJson.coordsToWkb("MultiPoint", "[[1,1],[5,-5]]")
    assert(Wkb.geomType(mp) == "MULTIPOINT" && Wkb.bbox(mp) == Wkb.BBox(1, -5, 5, 1))
    val mpoly = GeoJson.coordsToWkb("MultiPolygon", "[[[[0,0],[1,0],[1,1],[0,0]]],[[[5,5],[6,5],[6,6],[5,5]]]]")
    assert(Wkb.geomType(mpoly) == "MULTIPOLYGON" && Wkb.bbox(mpoly) == Wkb.BBox(0, 0, 6, 6))
    assert(GeoJson.coordsToWkb("Point", "[1e3, -2.5E-1]") != null) // scientific notation
  }

  test("readSeq: GeoJSONSeq lines become canonical feature envelopes") {
    val dir = Files.createTempDirectory("geojson").toString
    val lines = Seq(
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[11.5,48.1]},"properties":{"id":"m1","name":"munich","pop":1488}}""",
      """{"type":"Feature","geometry":{"type":"LineString","coordinates":[[0,0],[1,1]]},"properties":{"id":"l1","name":"diag"}}""",
      "")
    Files.writeString(java.nio.file.Paths.get(s"$dir/features.jsonl"), lines.mkString("\n"))
    val df = GeoJson.readSeq(spark, s"$dir/features.jsonl", "poi", "id")
    val rows = df.collect()
    assert(rows.length == 2)
    val m = rows.find(_.getAs[String]("feature_id") == "m1").get
    assert(m.getAs[String]("layer") == "poi")
    val wkb = m.getAs[Array[Byte]]("geom_wkb")
    assert(Wkb.geomType(wkb) == "POINT")
    assert(Wkb.bbox(wkb) == Wkb.BBox(11.5, 48.1, 11.5, 48.1))
    val props = m.getAs[Map[String, String]]("props")
    assert(props("name") == "munich" && props("pop") == "1488")
    val l = rows.find(_.getAs[String]("feature_id") == "l1").get
    assert(Wkb.geomType(l.getAs[Array[Byte]]("geom_wkb")) == "LINESTRING")
  }

  test("writeSeq → readSeq roundtrips the envelope, geometry bytes included") {
    val dir = Files.createTempDirectory("geojson_rt").toString
    val lines = Seq(
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[11.5,48.1]},"properties":{"id":"p1","name":"mu nich","n":"3"}}""",
      """{"type":"Feature","geometry":{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,0]],[[1,1],[2,1],[2,2],[1,1]]]},"properties":{"id":"p2"}}""",
      """{"type":"Feature","geometry":{"type":"MultiLineString","coordinates":[[[0,0],[1,1]],[[2,2],[3.25,3]]]},"properties":{"id":"p3","q":"a\"b"}}""")
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.jsonl"), lines.mkString("\n"))
    val orig = GeoJson.readSeq(spark, s"$dir/in.jsonl", "layer1", "id")
    GeoJson.writeSeq(orig, s"$dir/out", "id")
    val back = GeoJson.readSeq(spark, s"$dir/out", "layer1", "id")
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("feature_id"),
        r.getAs[Array[Byte]]("geom_wkb").toSeq,
        r.getAs[Map[String, String]]("props") - "id"))
      .sortBy(_._1).toSeq
    assert(snap(back) == snap(orig), "roundtrip changed the envelope")
  }

  test("Wkb.toGeoJson: exact geometry objects, inverse of coordsToWkb") {
    assert(Wkb.toGeoJson(Wkb.point(11.5, 48.1)) ==
      """{"type":"Point","coordinates":[11.5,48.1]}""")
    assert(Wkb.toGeoJson(Wkb.multi(4, Seq(Wkb.point(1.0, 2.0), Wkb.point(3.0, 4.0)))) ==
      """{"type":"MultiPoint","coordinates":[[1,2],[3,4]]}""")
    val poly = Wkb.polygon(Seq(
      Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)),
      Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 1.0))))
    assert(Wkb.toGeoJson(poly) ==
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,0]],[[1,1],[2,1],[2,2],[1,1]]]}""")
    // inverse through the reader's coordinate parser, byte-identical
    for (g <- Seq(Wkb.point(1.25, -2.5), poly,
        Wkb.lineString(Seq((0.0, 0.0), (1.5, 1.0))),
        Wkb.multi(6, Seq(poly)),
        Wkb.multi(5, Seq(Wkb.lineString(Seq((0.0, 0.0), (1.0, 1.0))))))) {
      val json = Wkb.toGeoJson(g)
      val gtype = json.split("\"")(3)
      val coords = json.substring(json.indexOf("\"coordinates\":") + 14, json.length - 1)
      assert(java.util.Arrays.equals(GeoJson.coordsToWkb(gtype, coords), g), json)
    }
  }

  test("3-position altitude CARRIES: Z-typed WKB both ways, mixed dims refuse") {
    def tw(wkb: Array[Byte]): Int =
      java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(1)
    val pz = GeoJson.coordsToWkb("Point", "[1.5, -2.5, 100.25]")
    assert(tw(pz) == 1001, tw(pz))
    assert(Wkb.bbox(pz) == Wkb.BBox(1.5, -2.5, 1.5, -2.5), "XY ops skip Z")
    assert(Wkb.toGeoJson(pz) == """{"type":"Point","coordinates":[1.5,-2.5,100.25]}""")
    val lz = GeoJson.coordsToWkb("LineString", "[[0,0,5],[1,1,6]]")
    assert(tw(lz) == 1002 && Wkb.length(lz) == math.sqrt(2.0))
    // lossless roundtrip through the writer and back
    for (g <- Seq(pz, lz,
        GeoJson.coordsToWkb("Polygon", "[[[0,0,1],[4,0,1],[4,4,2],[0,0,1]]]"),
        GeoJson.coordsToWkb("MultiPoint", "[[1,2,3],[4,5,6]]"),
        GeoJson.coordsToWkb("MultiLineString", "[[[0,0,1],[1,1,2]]]"))) {
      val json = Wkb.toGeoJson(g)
      val gtype = json.split("\"")(3)
      val coords = json.substring(json.indexOf("\"coordinates\":") + 14, json.length - 1)
      assert(java.util.Arrays.equals(GeoJson.coordsToWkb(gtype, coords), g), json)
    }
    // mixed 2-/3-element positions and 4-element positions refuse loudly
    val e1 = intercept[IllegalArgumentException] {
      GeoJson.coordsToWkb("LineString", "[[0,0,5],[1,1]]")
    }
    assert(e1.getMessage.contains("mixes"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      GeoJson.coordsToWkb("Point", "[1,2,3,4]")
    }
    assert(e2.getMessage.contains("elements"), e2.getMessage)
  }

  test("readSeq is deterministic: two reads of the same file are identical") {
    val dir = Files.createTempDirectory("geojson_det").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/f.jsonl"),
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"id":"x","n":"7"}}""")
    def snap() = GeoJson.readSeq(spark, s"$dir/f.jsonl", "poi", "id", eventTsUs = 1234567L)
      .withColumn("geom_wkb", org.apache.spark.sql.functions.hex(
        org.apache.spark.sql.functions.col("geom_wkb")))
      .collect().map(_.toString).sorted.toSeq
    assert(snap() == snap(), "same-file reads differ — envelope is nondeterministic")
  }

  test("splitFeatures: depth scan handles nested objects, strings with braces, escapes") {
    val doc = """{"type":"FeatureCollection","name":"t{e]st",
      "features":[
        {"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"id":"a","s":"br{ace"}},
        {"type":"Feature","geometry":{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,0]]]},"properties":{"id":"b","q":"\"esc]"}}
      ],
      "bbox":[0,0,2,2]}"""
    val fs = GeoJson.splitFeatures(doc)
    assert(fs.length == 2)
    assert(fs(0).contains("\"id\":\"a\"") && fs(1).contains("\"id\":\"b\""))
    assert(GeoJson.splitFeatures("""{"type":"FeatureCollection","features":[]}""").isEmpty)
    assert(GeoJson.splitFeatures("""{"no_features":true}""").isEmpty)
  }

  test("splitFeatures: only the depth-1 features key anchors the scan") {
    // the string "features" appears first inside a property VALUE, then as
    // a NESTED key — neither may anchor; only the top-level key does
    val doc = """{"type":"FeatureCollection",
      "name":"has \"features\" [here]",
      "meta":{"features":[{"decoy":1}],"n":1},
      "features":[
        {"type":"Feature","geometry":{"type":"Point","coordinates":[3,4]},"properties":{"id":"real"}}
      ]}"""
    val fs = GeoJson.splitFeatures(doc)
    assert(fs.length == 1, s"expected the 1 real feature, got ${fs.length}")
    assert(fs(0).contains("\"id\":\"real\""))
    assert(!fs(0).contains("decoy"))
    // a document with ONLY a nested/value occurrence yields nothing
    assert(GeoJson.splitFeatures("""{"meta":{"features":[{"x":1}]}}""").isEmpty)
    assert(GeoJson.splitFeatures("""{"name":"features","n":2}""").isEmpty)
  }

  test("readCollection produces the same envelope as readSeq") {
    val dir = Files.createTempDirectory("geojson_fc").toString
    val f1 = """{"type":"Feature","geometry":{"type":"Point","coordinates":[11.5,48.1]},"properties":{"id":"m1","name":"munich"}}"""
    val f2 = """{"type":"Feature","geometry":{"type":"LineString","coordinates":[[0,0],[1,1]]},"properties":{"id":"l1"}}"""
    Files.writeString(java.nio.file.Paths.get(s"$dir/fc.json"),
      s"""{"type":"FeatureCollection","features":[$f1,\n$f2]}""")
    Files.writeString(java.nio.file.Paths.get(s"$dir/seq.jsonl"), s"$f1\n$f2")
    def strip(df: org.apache.spark.sql.DataFrame) =
      df.drop("source") // source = path, differs by construction
        .withColumn("geom_wkb", org.apache.spark.sql.functions.hex(
          org.apache.spark.sql.functions.col("geom_wkb")))
        .collect().map(_.toString).sorted.toSeq
    val fc = strip(GeoJson.readCollection(spark, s"$dir/fc.json", "poi", "id", 42L))
    val seq = strip(GeoJson.readSeq(spark, s"$dir/seq.jsonl", "poi", "id", 42L))
    assert(fc == seq, s"FeatureCollection envelope differs from Seq form:\n$fc\nvs\n$seq")
  }

  test("readSeq output feeds the streaming serde roundtrip") {
    val dir = Files.createTempDirectory("geojson2").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/f.jsonl"),
      """{"type":"Feature","geometry":{"type":"Point","coordinates":[1,2]},"properties":{"id":"x"}}""")
    import org.apache.spark.sql.functions._
    val env = GeoJson.readSeq(spark, s"$dir/f.jsonl", "poi", "id")
      .select(graft.streaming.FeaturePipeline.packUdf(
        col("layer"), col("feature_id"), col("geom_wkb"), col("props"),
        unix_micros(col("event_ts")), col("source"), col("fmt_version")).as("value"))
    val back = graft.streaming.FeaturePipeline.decode(env).collect().head
    assert(back.getAs[String]("feature_id") == "x")
    assert(Wkb.bbox(back.getAs[Array[Byte]]("geom_wkb")) == Wkb.BBox(1, 2, 1, 2))
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.Wkb

class GeoParquetSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  private def layer(rows: Seq[(String, Array[Byte], String)]) = {
    import spark.implicits._
    rows.toDF("feature_id", "geometry", "etype")
  }

  test("write → read: WKB bit-lossless, geo footer intact, bbox correct, Spark schema preserved") {
    import spark.implicits._
    val pts = Seq(
      ("a", Wkb.point(-4.25, 42.5), "view"),
      ("b", Wkb.point(13.0625, -7.125), "click"),
      ("c", Wkb.point(1e-300, -0.0), "zone"))
    val dir = Files.createTempDirectory("geoparquet_spec").toString + "/layer"
    GeoParquet.write(layer(pts), dir, "geometry", Seq("Point"))
    // metadata: version/primary/encoding per the public 1.0.0 spec shape,
    // bbox = the layer envelope
    val meta = GeoParquet.metaOf(spark, dir)
    assert(meta.version == GeoParquet.SpecVersion)
    assert(meta.primaryColumn == "geometry" && meta.encoding == "WKB")
    assert(meta.geometryTypes == Seq("Point"))
    assert(meta.bbox == Seq(-4.25, -7.125, 13.0625, 42.5))
    // payload: bytes re-ingest bit-lossless — the read path never
    // transforms the column
    val back = GeoParquet.read(spark, dir)
      .select($"feature_id", $"geometry", $"etype")
      .collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1), r.getString(2)))
      .sortBy(_._1)
    assert(back.length == 3)
    pts.sortBy(_._1).zip(back).foreach { case ((id, wkb, et), (bid, bwkb, bet)) =>
      assert(id == bid && et == bet)
      assert(java.util.Arrays.equals(wkb, bwkb), s"WKB not bit-identical for $id")
    }
    // the stamp preserved Spark's own footer entry: the frame reads back
    // with the full typed schema, not a generic one
    assert(GeoParquet.read(spark, dir).schema.map(_.name) ==
      Seq("feature_id", "geometry", "etype"))
    // re-stamping is idempotent (key replaced, not duplicated): write the
    // same layer again over the same dir
    GeoParquet.write(layer(pts), dir, "geometry", Seq("Point"))
    assert(GeoParquet.metaOf(spark, dir).bbox == meta.bbox)
  }

  test("plain parquet and malformed geo entries are rejected loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("geoparquet_spec2").toString + "/plain"
    Seq(("a", 1)).toDF("feature_id", "v").write.parquet(dir)
    val e = intercept[IllegalArgumentException] { GeoParquet.read(spark, dir) }
    assert(e.getMessage.contains("no 'geo' footer entry"))
    // malformed JSON in the geo key
    val conf = spark.sparkContext.hadoopConfiguration
    val part = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(conf).listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    GeoParquet.stampFile(conf, part, "{not json")
    val e2 = intercept[IllegalArgumentException] { GeoParquet.metaOf(spark, dir) }
    assert(e2.getMessage.contains("unparseable"))
    // non-WKB encoding
    GeoParquet.stampFile(conf, part,
      """{"version":"1.0.0","primary_column":"g","columns":{"g":{"encoding":"point","bbox":[0,0,1,1]}}}""")
    val e3 = intercept[IllegalArgumentException] { GeoParquet.metaOf(spark, dir) }
    assert(e3.getMessage.contains("unsupported encoding"))
    // geo names a primary column the parquet schema doesn't have
    GeoParquet.stampFile(conf, part,
      """{"version":"1.0.0","primary_column":"g","columns":{"g":{"encoding":"WKB","bbox":[0,0,1,1]}}}""")
    val e4 = intercept[IllegalArgumentException] { GeoParquet.read(spark, dir) }
    assert(e4.getMessage.contains("not in parquet schema"))
  }

  test("readBbox: footer-level file pruning — disjoint files never scanned, empty window reads nothing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("geoparquet_spec4").toString + "/pruned"
    // range-partition on x so the two part files are spatially disjoint:
    // west file holds x ∈ {-50, -40}, east file x ∈ {40, 50}
    val df = layer(Seq(
      ("w1", Wkb.point(-50.0, 5.0), "a"), ("w2", Wkb.point(-40.0, -5.0), "b"),
      ("e1", Wkb.point(40.0, 5.0), "c"), ("e2", Wkb.point(50.0, -5.0), "d")))
      .withColumn("x", udf { (g: Array[Byte]) => Wkb.bbox(g).xmin }.apply($"geometry"))
      .repartitionByRange(2, $"x").drop("x")
    GeoParquet.write(df, dir, "geometry", Seq("Point"))
    // window over the west half: only the west file's rows come back,
    // and the OTHER file was pruned at the FOOTER (never scanned) —
    // observable because the scanned file list is exactly the survivors
    val west = GeoParquet.readBbox(spark, dir, -60.0, -10.0, -30.0, 10.0)
    assert(west.select($"feature_id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("w1", "w2"))
    assert(west.inputFiles.length == 1, west.inputFiles.mkString(","))
    // window over the gap between the files: zero files survive
    assert(GeoParquet.readBbox(spark, dir, -10.0, -1.0, 10.0, 1.0).count() == 0)
    // window spanning both: everything
    assert(GeoParquet.readBbox(spark, dir, -100.0, -10.0, 100.0, 10.0).count() == 4)
    // boundary touch counts as intersecting (<=, not <)
    assert(GeoParquet.readBbox(spark, dir, -40.0, -10.0, -35.0, 10.0)
      .select($"feature_id").collect().map(_.getString(0)).sorted.toSeq == Seq("w1", "w2"))
  }

  test("covering (1.1): per-row bbox struct declared in geo, predicate pushed to the parquet scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("geoparquet_spec5").toString + "/covering"
    val df = layer(Seq(
      ("a", Wkb.point(-50.0, 5.0), "x"), ("b", Wkb.point(-40.0, -5.0), "y"),
      ("c", Wkb.point(40.0, 5.0), "z"), ("d", Wkb.point(50.0, -5.0), "w")))
    GeoParquet.writeCovering(df, dir, "geometry", Seq("Point"))
    // metadata carries the covering declaration + the 1.1 version bump
    val conf = spark.sparkContext.hadoopConfiguration
    val part = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(conf).listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val geo = org.apache.parquet.hadoop.ParquetFileReader
      .readFooter(org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(part, conf),
        org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
      .getFileMetaData.getKeyValueMetaData.get("geo")
    assert(geo.contains("\"covering\":{\"bbox\""), geo)
    assert(geo.contains("\"version\":\"1.1.0\""), geo)
    // the geo JSON still parses (metaOf) after the surgery
    assert(GeoParquet.metaOf(spark, dir).primaryColumn == "geometry")
    // window read: right rows, and the bbox predicate reaches the scan as
    // PushedFilters — the row-group stats pruning hook
    val win = GeoParquet.readCovering(spark, dir, -60.0, -10.0, -30.0, 10.0)
    assert(win.select($"feature_id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a", "b"))
    val plan = win.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("bbox.xmin"),
      "bbox predicate not pushed to the parquet scan:\n" + plan)
    // a plain (no-covering) layer is refused loudly
    val plainDir = Files.createTempDirectory("geoparquet_spec6").toString + "/plain"
    GeoParquet.write(df, plainDir, "geometry", Seq("Point"))
    val e = intercept[IllegalArgumentException] {
      GeoParquet.readCovering(spark, plainDir, 0, 0, 1, 1)
    }
    assert(e.getMessage.contains("declares no covering"))
  }

  test("crs loudness: CRS84/4326 accepted, unknown CRS red-without / green-with registration, " +
    "3857 reprojects back to lon/lat, readBbox refuses foreign footers") {
    val lonLat = Seq((-4.25, 42.5), (13.0625, -7.125), (151.2, -33.85))
    val dir = Files.createTempDirectory("geoparquet_crs").toString + "/merc"
    // a 3857 layer: geometry stored in mercator meters, footer says EPSG:3857
    val merc = layer(lonLat.zipWithIndex.map { case ((lon, lat), i) =>
      val (x, y) = Wkb.lonLatToMercator(lon, lat)
      (s"f$i", Wkb.point(x, y), "view")
    })
    GeoParquet.write(merc, dir, "geometry", Seq("Point"))
    val conf = spark.sparkContext.hadoopConfiguration
    val parts = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(conf).listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
    parts.foreach(p => GeoParquet.stampFile(conf, p,
      GeoParquet.geoJsonCrs("geometry", Seq("Point"),
        Seq(Double.NaN, Double.NaN, Double.NaN, Double.NaN), "EPSG", "3857")))
    assert(GeoParquet.metaOf(spark, dir).srid == 3857)
    // read() reprojects the payload back to lon/lat through the registry
    val got = GeoParquet.read(spark, dir)
      .collect().map { r =>
        val bb = Wkb.bbox(r.getAs[Array[Byte]](1)) // a point's box is the point
        r.getString(0) -> (bb.xmin, bb.ymin)
      }.toMap
    lonLat.zipWithIndex.foreach { case ((lon, lat), i) =>
      val (gx, gy) = got(s"f$i")
      assert(math.abs(gx - lon) < 1e-9 && math.abs(gy - lat) < 1e-9,
        s"f$i: expected ($lon,$lat), got ($gx,$gy)")
    }
    // footer pruning against a lon/lat window would be axis salad — loud
    val eb = intercept[IllegalArgumentException] {
      GeoParquet.readBbox(spark, dir, -10, -10, 10, 10)
    }
    assert(eb.getMessage.contains("lon/lat"))
    // CRS84 and 4326 spellings are the default — accepted, payload untouched
    parts.foreach(p => GeoParquet.stampFile(conf, p,
      GeoParquet.geoJsonCrs("geometry", Seq("Point"),
        Seq(Double.NaN, Double.NaN, Double.NaN, Double.NaN), "OGC", "CRS84")))
    assert(GeoParquet.metaOf(spark, dir).srid == 0)
    // unknown CRS: RED without a registration…
    parts.foreach(p => GeoParquet.stampFile(conf, p,
      GeoParquet.geoJsonCrs("geometry", Seq("Point"),
        Seq(Double.NaN, Double.NaN, Double.NaN, Double.NaN), "EPSG", "90210")))
    val e = intercept[IllegalArgumentException] { GeoParquet.metaOf(spark, dir) }
    assert(e.getMessage.contains("EPSG:90210"))
    // …GREEN with one (any registered grid makes the code honorable)
    try {
      graft.functions.Crs.registerTm(90210, 0.9996, 9.0, 500000.0, 0.0)
      assert(GeoParquet.metaOf(spark, dir).srid == 90210)
    } finally graft.functions.Crs.unregister(90210)
    // a non-object crs and an id-less PROJJSON are refused too
    parts.foreach(p => GeoParquet.stampFile(conf, p,
      """{"version":"1.0.0","primary_column":"geometry","columns":{"geometry":{"encoding":"WKB","geometry_types":["Point"],"crs":"EPSG:3857"}}}"""))
    intercept[IllegalArgumentException] { GeoParquet.metaOf(spark, dir) }
  }

  test("geometry_types validation: a mislabeled payload fails loudly on read") {
    val dir = Files.createTempDirectory("geoparquet_types").toString + "/mis"
    val df = layer(Seq(
      ("a", Wkb.point(0.0, 0.0), "x"),
      ("b", Wkb.lineString(Seq((0.0, 0.0), (1.0, 1.0))), "y")))
    // declare Point only — the LineString row must trip the sample check
    GeoParquet.write(df, dir, "geometry", Seq("Point"))
    val e = intercept[IllegalArgumentException] { GeoParquet.read(spark, dir) }
    assert(e.getMessage.contains("LINESTRING") && e.getMessage.contains("mislabeled"))
    // honest declaration (both types) reads fine
    val dir2 = Files.createTempDirectory("geoparquet_types2").toString + "/ok"
    GeoParquet.write(df, dir2, "geometry", Seq("Point", "LineString"))
    assert(GeoParquet.read(spark, dir2).count() == 2)
  }

  test("multi-file layers: per-file bboxes union; disagreeing primaries rejected") {
    import spark.implicits._
    val dir = Files.createTempDirectory("geoparquet_spec3").toString + "/multi"
    // force 2 part files via repartition
    val df = layer(Seq(
      ("a", Wkb.point(0.0, 0.0), "x"), ("b", Wkb.point(10.0, 20.0), "y"),
      ("c", Wkb.point(-5.0, 3.0), "z"), ("d", Wkb.point(7.0, -9.0), "w")))
      .repartition(2)
    GeoParquet.write(df, dir, "geometry", Seq("Point"))
    val conf = spark.sparkContext.hadoopConfiguration
    val parts = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(conf).listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
    assert(parts.length == 2)
    assert(GeoParquet.metaOf(spark, dir).bbox == Seq(-5.0, -9.0, 10.0, 20.0))
    // hand-stamp one file with narrow per-file boxes: metaOf unions them
    GeoParquet.stampFile(conf, parts(0),
      GeoParquet.geoJson("geometry", Seq("Point"), Seq(-5.0, -9.0, 0.0, 3.0)))
    GeoParquet.stampFile(conf, parts(1),
      GeoParquet.geoJson("geometry", Seq("Point"), Seq(0.0, 0.0, 10.0, 20.0)))
    assert(GeoParquet.metaOf(spark, dir).bbox == Seq(-5.0, -9.0, 10.0, 20.0))
    // a part file disagreeing on the primary column is a loud error
    GeoParquet.stampFile(conf, parts(1),
      """{"version":"1.0.0","primary_column":"other","columns":{"other":{"encoding":"WKB","bbox":[0,0,1,1]}}}""")
    intercept[IllegalArgumentException] { GeoParquet.metaOf(spark, dir) }
  }
}

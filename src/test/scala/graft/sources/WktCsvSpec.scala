package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.Wkb

class WktCsvSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  private def envelope(rows: Seq[(String, Array[Byte], Map[String, String])]) = {
    import spark.implicits._
    rows.toDF("feature_id", "geom_wkb", "props")
      .select($"feature_id", $"geom_wkb", $"props",
        lit("l").as("layer"), timestamp_micros(lit(0L)).as("event_ts"),
        lit("src").as("source"), lit(1).as("fmt_version"))
  }

  test("write → read roundtrips geometry bytes and props exactly; polygon WKT commas survive CSV quoting") {
    import spark.implicits._
    val poly = Wkb.polygon(Seq(Seq((0.0, 0.0), (4.0, 0.0), (4.0, 3.5), (0.0, 0.0))))
    val pt = Wkb.point(11.25, -48.0625)
    val dir = Files.createTempDirectory("wktcsv_spec").toString
    WktCsv.write(envelope(Seq(
      ("a", pt, Map("etype" -> "view", "k" -> "7")),
      ("b", poly, Map("etype" -> "zone", "k" -> "9")))), dir, Seq("etype", "k"))
    val back = WktCsv.read(spark, dir, "lyr", "feature_id", "wkt")
      .select($"feature_id", $"geom_wkb", $"props")
      .collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1),
        r.getAs[Map[String, String]](2))).sortBy(_._1)
    assert(back.length == 2)
    assert(back(0)._1 == "a" && java.util.Arrays.equals(back(0)._2, pt))
    assert(back(0)._3 == Map("etype" -> "view", "k" -> "7"))
    // the polygon row is the quoting canary: its WKT contains commas
    assert(back(1)._1 == "b" && java.util.Arrays.equals(back(1)._2, poly),
      "polygon WKB not bit-identical through CSV quoting + WKT codec")
    assert(back(1)._3 == Map("etype" -> "zone", "k" -> "9"))
  }

  test("extreme doubles survive the WKT text roundtrip bit-exactly") {
    import spark.implicits._
    val pts = Seq(1e-300, -0.0, 123456789.123456789, 2.2250738585072014e-308)
      .map(x => Wkb.point(x, -x))
    val dir = Files.createTempDirectory("wktcsv_spec2").toString
    WktCsv.write(envelope(pts.zipWithIndex.map { case (w, i) =>
      (i.toString, w, Map.empty[String, String]) }), dir, Nil)
    val back = WktCsv.read(spark, dir, "l", "feature_id", "wkt")
      .select($"feature_id", $"geom_wkb")
      .collect().map(r => r.getString(0).toInt -> r.getAs[Array[Byte]](1))
      .sortBy(_._1).map(_._2)
    pts.zip(back).zipWithIndex.foreach { case ((orig, rt), i) =>
      assert(java.util.Arrays.equals(rt, orig), s"row $i not bit-exact")
    }
  }

  test("read is distributed and splittable: a multi-part write reads back complete") {
    import spark.implicits._
    val dir = Files.createTempDirectory("wktcsv_spec3").toString
    val env = spark.range(200)
      .select($"id".cast("string").as("feature_id"),
        lit(null).cast("binary").as("geom_wkb"),
        map(lit("v"), $"id".cast("string")).as("props"))
      .repartition(8)
    WktCsv.write(env, dir, Seq("v"))
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".csv")) > 1,
      "fixture should span multiple part files to exercise the splittable path")
    val n = WktCsv.read(spark, dir, "l", "feature_id", "wkt").count()
    assert(n == 200)
  }
}

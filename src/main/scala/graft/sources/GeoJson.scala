package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Wkb

/** GeoJSON source (SURVEY.md §2 A1: the reference's producer reads vector
  * files — Shapefile/GeoJSON/GPKG via OGR [UPSTREAM-UNVERIFIED]; GeoJSON
  * is the one expressible with zero native deps).
  *
  * Reads newline-delimited GeoJSON (GeoJSONSeq: one Feature per line) —
  * the splittable form a 100 TB ingest actually uses; a single
  * FeatureCollection file cannot be split across executors, so the
  * canonical-envelope path standardizes on the sequence form.
  *
  * Scale shape: one distributed text scan; per-line scalar JSON extraction
  * (codegen'd `get_json_object`) plus one UDF that converts the GeoJSON
  * coordinates array to WKB via the [[Wkb]] builders. Output is the
  * engine's canonical feature envelope (SURVEY.md §1.3), ready for
  * `FeaturePipeline` or the relational tier.
  */
object GeoJson {

  /** Parse a GeoJSON coordinates value (nested JSON number arrays) into
    * nesting-depth + flat coordinate pairs, then encode WKB. Supports
    * Point / LineString / Polygon / MultiPoint / MultiLineString /
    * MultiPolygon. Pure recursive-descent over brackets and numbers —
    * no JSON library needed for this grammar.
    */
  private[sources] def coordsToWkb(geomType: String, coords: String): Array[Byte] = {
    // recursive parse of [ ... ] into either Double or Seq[Any]
    var pos = 0
    def skipWs(): Unit = while (pos < coords.length && coords.charAt(pos).isWhitespace) pos += 1
    def parseValue(): Any = {
      skipWs()
      if (coords.charAt(pos) == '[') {
        pos += 1 // '['
        val items = scala.collection.mutable.ArrayBuffer.empty[Any]
        skipWs()
        while (coords.charAt(pos) != ']') {
          items += parseValue()
          skipWs()
          if (coords.charAt(pos) == ',') { pos += 1; skipWs() }
        }
        pos += 1 // ']'
        items.toSeq
      } else {
        val start = pos
        while (pos < coords.length && "+-.eE0123456789".indexOf(coords.charAt(pos)) >= 0) pos += 1
        coords.substring(start, pos).toDouble
      }
    }
    def pt(v: Any): (Double, Double) = v match {
      case s: Seq[_] => (s.head.asInstanceOf[Double], s(1).asInstanceOf[Double])
      case other => throw new IllegalArgumentException(s"geojson: expected position, got $other")
    }
    def pts(v: Any): Seq[(Double, Double)] =
      v.asInstanceOf[Seq[Any]].map(pt)
    def rings(v: Any): Seq[Seq[(Double, Double)]] =
      v.asInstanceOf[Seq[Any]].map(pts)

    val parsed = parseValue()
    geomType match {
      case "Point" => { val (x, y) = pt(parsed); Wkb.point(x, y) }
      case "LineString" => Wkb.lineString(pts(parsed))
      case "Polygon" => Wkb.polygon(rings(parsed))
      case "MultiPoint" =>
        Wkb.multi(4, pts(parsed).map { case (x, y) => Wkb.point(x, y) })
      case "MultiLineString" =>
        Wkb.multi(5, rings(parsed).map(Wkb.lineString))
      case "MultiPolygon" =>
        Wkb.multi(6, parsed.asInstanceOf[Seq[Any]].map(r => Wkb.polygon(rings(r))))
      case other => throw new IllegalArgumentException(s"geojson: unsupported geometry type $other")
    }
  }

  private val wkbUdf = udf { (gtype: String, coords: String) =>
    if (gtype == null || coords == null) null else coordsToWkb(gtype, coords)
  }

  /** Newline-delimited GeoJSON → canonical feature envelope.
    *
    * @param layer   layer name stamped on every feature
    * @param idField property key used as feature_id (stringified)
    */
  def readSeq(spark: SparkSession, path: String, layer: String, idField: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).toDF("line")
      .filter(length(trim($"line")) > 0)
      .select(
        lit(layer).as("layer"),
        get_json_object($"line", s"$$.properties.$idField").as("feature_id"),
        wkbUdf(
          get_json_object($"line", "$.geometry.type"),
          get_json_object($"line", "$.geometry.coordinates")).as("geom_wkb"),
        from_json(get_json_object($"line", "$.properties"),
          MapType(StringType, StringType)).as("props"),
        current_timestamp().as("event_ts"),
        lit(path).as("source"),
        lit(1).as("fmt_version"))
  }
}

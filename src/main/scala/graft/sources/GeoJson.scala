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
  * [[readCollection]] covers whole-file FeatureCollection documents for
  * interop, producing the identical envelope.
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
    // RFC 7946 positions are [lon, lat] or [lon, lat, ALTITUDE]: the
    // third element is CARRIED into Z-typed (ISO) WKB, not dropped —
    // every Wkb consumer skips extra dims for XY ops, and [[Wkb
    // .toGeoJson]] writes the altitude back (lossless roundtrip). A
    // geometry mixing 2- and 3-element positions, or positions beyond 3
    // elements ("SHOULD NOT", RFC 7946 §3.1.1), refuses loudly.
    def pt(v: Any): IndexedSeq[Double] = v match {
      case s: Seq[_] =>
        require(s.length == 2 || s.length == 3,
          s"geojson: position with ${s.length} elements — expected [lon, lat] or [lon, lat, alt]")
        s.map(_.asInstanceOf[Double]).toIndexedSeq
      case other => throw new IllegalArgumentException(s"geojson: expected position, got $other")
    }
    def pts(v: Any): Seq[IndexedSeq[Double]] =
      v.asInstanceOf[Seq[Any]].map(pt)
    def rings(v: Any): Seq[Seq[IndexedSeq[Double]]] =
      v.asInstanceOf[Seq[Any]].map(pts)
    def zOf(all: Seq[IndexedSeq[Double]]): Boolean = {
      val dims = all.map(_.length).distinct
      require(dims.length == 1,
        "geojson: geometry mixes 2- and 3-element positions — refusing")
      dims.head == 3
    }

    val parsed = parseValue()
    geomType match {
      case "Point" =>
        val p = pt(parsed)
        Wkb.pointIso(p, hasZ = p.length == 3, hasM = false)
      case "LineString" =>
        val ps = pts(parsed)
        Wkb.lineStringIso(ps, hasZ = zOf(ps), hasM = false)
      case "Polygon" =>
        val rs = rings(parsed)
        Wkb.polygonIso(rs, hasZ = zOf(rs.flatten), hasM = false)
      case "MultiPoint" =>
        val ps = pts(parsed)
        val z = zOf(ps)
        Wkb.multiIso(4, z, hasM = false,
          ps.map(p => Wkb.pointIso(p, hasZ = z, hasM = false)))
      case "MultiLineString" =>
        val rs = rings(parsed)
        val z = zOf(rs.flatten)
        Wkb.multiIso(5, z, hasM = false,
          rs.map(Wkb.lineStringIso(_, hasZ = z, hasM = false)))
      case "MultiPolygon" =>
        val ms = parsed.asInstanceOf[Seq[Any]].map(rings)
        val z = zOf(ms.flatten.flatten)
        Wkb.multiIso(6, z, hasM = false,
          ms.map(Wkb.polygonIso(_, hasZ = z, hasM = false)))
      case other => throw new IllegalArgumentException(s"geojson: unsupported geometry type $other")
    }
  }

  private val wkbUdf = udf { (gtype: String, coords: String) =>
    if (gtype == null || coords == null) null else coordsToWkb(gtype, coords)
  }

  /** One Feature-JSON column → the canonical envelope. The event
    * timestamp is caller-supplied (vector files carry no event time):
    * stamping wall-clock here would make two reads of the same file
    * differ, breaking replay and hash-determinism downstream.
    */
  private def envelope(lines: DataFrame, path: String, layer: String,
      idField: String, eventTsUs: Long): DataFrame =
    lines.select(
      lit(layer).as("layer"),
      get_json_object(col("line"), s"$$.properties.$idField").as("feature_id"),
      wkbUdf(
        get_json_object(col("line"), "$.geometry.type"),
        get_json_object(col("line"), "$.geometry.coordinates")).as("geom_wkb"),
      from_json(get_json_object(col("line"), "$.properties"),
        MapType(StringType, StringType)).as("props"),
      timestamp_micros(lit(eventTsUs)).as("event_ts"),
      lit(path).as("source"),
      lit(1).as("fmt_version"))

  /** Newline-delimited GeoJSON → canonical feature envelope.
    *
    * @param layer     layer name stamped on every feature
    * @param idField   property key used as feature_id (stringified)
    * @param eventTsUs event time (µs) stamped on every feature — pass the
    *                  file's publication time; deterministic by design
    */
  def readSeq(spark: SparkSession, path: String, layer: String, idField: String,
      eventTsUs: Long = 0L): DataFrame = {
    import spark.implicits._
    envelope(
      spark.read.textFile(path).toDF("line").filter(length(trim($"line")) > 0),
      path, layer, idField, eventTsUs)
  }

  /** Splits the top-level `features` array of a FeatureCollection document
    * into one JSON string per feature: a brace/bracket depth scan that
    * respects string literals and escapes — no JSON library, no schema
    * inference (which would mangle the heterogeneous coordinates nesting).
    */
  private[sources] def splitFeatures(doc: String): Array[String] = {
    // Locate the `features` key at object depth 1, outside any string — a
    // property value or nested key containing the text "features" earlier
    // in the document must not anchor the scan at the wrong '['.
    var i = 0
    var kdepth = 0
    var arrStart = -1
    while (i < doc.length && arrStart < 0) {
      doc.charAt(i) match {
        case '"' =>
          // consume the whole string literal (escapes respected); keep its
          // raw content to test for the depth-1 `features` key
          val sb = new java.lang.StringBuilder
          var j = i + 1
          var esc = false
          var closed = false
          while (j < doc.length && !closed) {
            val d = doc.charAt(j)
            if (esc) { esc = false; sb.append(d) }
            else if (d == '\\') esc = true
            else if (d == '"') closed = true
            else sb.append(d)
            j += 1
          }
          if (kdepth == 1 && sb.toString == "features") {
            var k = j
            while (k < doc.length && Character.isWhitespace(doc.charAt(k))) k += 1
            if (k < doc.length && doc.charAt(k) == ':') {
              var m = k + 1
              while (m < doc.length && Character.isWhitespace(doc.charAt(m))) m += 1
              if (m < doc.length && doc.charAt(m) == '[') arrStart = m
            }
          }
          i = j
        case '{' | '[' => kdepth += 1; i += 1
        case '}' | ']' => kdepth -= 1; i += 1
        case _ => i += 1
      }
    }
    if (arrStart < 0) return Array.empty
    var pos = arrStart
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    pos += 1
    var depth = 0
    var start = -1
    var inStr = false
    var escaped = false
    var done = false
    while (pos < doc.length && !done) {
      val c = doc.charAt(pos)
      if (inStr) {
        if (escaped) escaped = false
        else if (c == '\\') escaped = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' => if (depth == 0) start = pos; depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) { out += doc.substring(start, pos + 1); start = -1 }
        case ']' if depth == 0 => done = true // end of the features array
        case _ => ()
      }
      pos += 1
    }
    out.toArray
  }

  private val splitUdf = udf { (doc: String) =>
    if (doc == null) Array.empty[String] else splitFeatures(doc)
  }

  /** Whole-file GeoJSON `FeatureCollection` → the same canonical envelope
    * as [[readSeq]]. A single-document file is NOT splittable — each file
    * is one task — so this is the small-file/interop path; bulk ingest
    * standardizes on the sequence form. Globs work: each matched file
    * parses independently.
    */
  def readCollection(spark: SparkSession, path: String, layer: String,
      idField: String, eventTsUs: Long = 0L): DataFrame = {
    val docs = spark.read.option("wholetext", "true").text(path).toDF("doc")
    envelope(
      docs.select(explode(splitUdf(col("doc"))).as("line")),
      path, layer, idField, eventTsUs)
  }

  // ----------------------------------------------------------- write side
  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** One canonical-envelope row → one GeoJSON Feature line. Properties
    * are emitted key-sorted (map iteration order must not leak into
    * bytes) with the id field first, so [[readSeq]] on the output
    * reproduces the same feature_id/props/geometry — the roundtrip
    * contract GeoJsonSpec pins. Null geometry → `"geometry":null`
    * (valid GeoJSON for an unlocated feature).
    */
  private[sources] def featureLine(fid: String, wkb: Array[Byte],
      props: Map[String, String], idField: String): String = {
    val sb = new java.lang.StringBuilder
    sb.append("{\"type\":\"Feature\",\"geometry\":")
    if (wkb == null) sb.append("null") else sb.append(Wkb.toGeoJson(wkb))
    sb.append(",\"properties\":{")
    sb.append('"').append(jsonEscape(idField)).append("\":\"").append(jsonEscape(fid)).append('"')
    if (props != null) {
      props.toSeq.sortBy(_._1).foreach { case (k, v) =>
        if (k != idField) {
          sb.append(",\"").append(jsonEscape(k)).append("\":")
          if (v == null) sb.append("null")
          else sb.append('"').append(jsonEscape(v)).append('"')
        }
      }
    }
    sb.append("}}")
    sb.toString
  }

  private def lineUdf(idField: String) = udf {
    (fid: String, wkb: Array[Byte], props: Map[String, String]) =>
      featureLine(fid, wkb, props, idField)
  }

  /** Canonical feature envelope → newline-delimited GeoJSON (GeoJSONSeq),
    * the splittable interchange form [[readSeq]] consumes — the A-surface
    * write path. One distributed text write, map-side only; a re-read of
    * the output with the same layer/idField/eventTs reproduces the
    * original envelope (geometry bytes included — [[Wkb.toGeoJson]] and
    * [[coordsToWkb]] are exact inverses on canonical WKB).
    */
  def writeSeq(features: DataFrame, path: String, idField: String): Unit =
    features
      .select(lineUdf(idField)(col("feature_id"), col("geom_wkb"), col("props")).as("value"))
      .write.mode("overwrite").text(path)
}

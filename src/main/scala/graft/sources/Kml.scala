package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Wkb

/** KML source (SURVEY.md §2 A1 long tail: the reference's producer reads
  * vector files via OGR [UPSTREAM-UNVERIFIED]; KML joins the
  * GeoJSON/Shapefile/GPKG trio as the fourth format, the one Google
  * Earth/Maps exports ship in). Pure-Scala XML subset parser — no
  * scala-xml, no native deps — handling the grammar real KML uses:
  * `<Placemark>` with an `id` attribute, `<name>`,
  * `<ExtendedData>`/`<Data name=..><value>..` and `<SchemaData>`/
  * `<SimpleData name=..>` properties, and Point / LineString / Polygon
  * (outer + inner rings) / MultiGeometry geometries with
  * "lon,lat[,alt]" whitespace-separated coordinate tuples. The five XML
  * entities are unescaped on read and escaped on write.
  *
  * Scale shape: a KML document is ONE XML tree — inherently not
  * line-splittable — so like [[GeoJson.readCollection]] each file is one
  * task and parallelism comes from the file GLOB (a real export lands as
  * thousands of per-region .kml files). The placemark splitter and the
  * per-placemark envelope parser both run executor-side inside one
  * mapPartitions-shaped pass (wholetext scan → split UDF → explode →
  * parse UDF); only file paths touch the driver.
  */
object Kml {

  // ------------------------------------------------------------ write side
  sealed trait KGeom
  final case class KPoint(x: Double, y: Double) extends KGeom
  final case class KLine(pts: Seq[(Double, Double)]) extends KGeom
  /** head ring = outer boundary, rest = holes */
  final case class KPolygon(rings: Seq[Seq[(Double, Double)]]) extends KGeom
  final case class KMulti(members: Seq[KGeom]) extends KGeom

  private[sources] def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case '\'' => "&apos;"
    case c => c.toString
  }

  private[sources] def xmlUnescape(s: String): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        val ent = if (semi > i) s.substring(i + 1, semi) else ""
        ent match {
          case "amp" => sb.append('&'); i = semi + 1
          case "lt" => sb.append('<'); i = semi + 1
          case "gt" => sb.append('>'); i = semi + 1
          case "quot" => sb.append('"'); i = semi + 1
          case "apos" => sb.append('\''); i = semi + 1
          case _ => sb.append(c); i += 1 // not one of the five: literal '&'
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** "lon,lat lon,lat ..." — Double.toString round-trips exactly through
    * toDouble, so write → read preserves coordinates bit-for-bit.
    */
  private def coordString(pts: Seq[(Double, Double)]): String =
    pts.map { case (x, y) => s"$x,$y" }.mkString(" ")

  private def geomXml(g: KGeom): String = g match {
    case KPoint(x, y) => s"<Point><coordinates>$x,$y</coordinates></Point>"
    case KLine(pts) =>
      s"<LineString><coordinates>${coordString(pts)}</coordinates></LineString>"
    case KPolygon(rings) =>
      val outer =
        s"<outerBoundaryIs><LinearRing><coordinates>${coordString(rings.head)}</coordinates></LinearRing></outerBoundaryIs>"
      val inner = rings.tail.map(r =>
        s"<innerBoundaryIs><LinearRing><coordinates>${coordString(r)}</coordinates></LinearRing></innerBoundaryIs>")
        .mkString
      s"<Polygon>$outer$inner</Polygon>"
    case KMulti(members) =>
      s"<MultiGeometry>${members.map(geomXml).mkString}</MultiGeometry>"
  }

  /** One placemark: id attribute + key-sorted `<Data>` properties (map
    * iteration order must not leak into bytes — the GeoJson write-side
    * discipline) + geometry.
    */
  private[sources] def placemarkXml(fid: String, props: Map[String, String],
      geom: KGeom): String = {
    val data = props.toSeq.sortBy(_._1).map { case (k, v) =>
      s"""<Data name="${xmlEscape(k)}"><value>${xmlEscape(v)}</value></Data>"""
    }.mkString
    s"""<Placemark id="${xmlEscape(fid)}"><ExtendedData>$data</ExtendedData>${geomXml(geom)}</Placemark>"""
  }

  /** A complete single-Document KML file. */
  def writeKml(placemarks: Seq[(String, Map[String, String], KGeom)]): String = {
    val body = placemarks.map { case (fid, props, g) => placemarkXml(fid, props, g) }
      .mkString("\n")
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<kml xmlns=\"http://www.opengis.net/kml/2.2\">\n<Document>\n" +
      body + "\n</Document>\n</kml>\n"
  }

  // ------------------------------------------------------------- read side
  /** Split a KML document into raw `<Placemark ...>...</Placemark>` blocks.
    * A depth-counting scan (nested Placemarks — legal in folders-of-
    * folders exports — stay inside their outermost block); comments and
    * CDATA are skipped so a commented-out placemark is not resurrected.
    */
  private[sources] def splitPlacemarks(doc: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    var depth = 0
    var start = -1
    while (i < doc.length) {
      if (doc.startsWith("<!--", i)) {
        val e = doc.indexOf("-->", i); i = if (e < 0) doc.length else e + 3
      } else if (doc.startsWith("<![CDATA[", i)) {
        val e = doc.indexOf("]]>", i); i = if (e < 0) doc.length else e + 3
      } else if (doc.startsWith("<Placemark", i) &&
          (i + 10 >= doc.length || doc.charAt(i + 10) == '>' ||
            doc.charAt(i + 10).isWhitespace || doc.startsWith("/>", i + 10))) {
        if (depth == 0) start = i
        depth += 1
        // self-closing (degenerate but legal): emit immediately
        val close = doc.indexOf('>', i)
        if (close > 0 && doc.charAt(close - 1) == '/') {
          depth -= 1
          if (depth == 0) { out += doc.substring(start, close + 1); start = -1 }
        }
        i = if (close < 0) doc.length else close + 1
      } else if (doc.startsWith("</Placemark>", i)) {
        depth -= 1
        if (depth == 0 && start >= 0) {
          out += doc.substring(start, i + "</Placemark>".length)
          start = -1
        }
        i += "</Placemark>".length
      } else i += 1
    }
    out.toArray
  }

  /** First content of `<tag>...</tag>` inside `s` (entity-unescaped), or
    * null. `from` bounds the search so ring scans can walk sub-ranges.
    */
  private def tagContent(s: String, tag: String, from: Int = 0): String = {
    val open = s.indexOf(s"<$tag", from)
    if (open < 0) return null
    val gt = s.indexOf('>', open)
    if (gt < 0) return null
    val close = s.indexOf(s"</$tag>", gt)
    if (close < 0) return null
    s.substring(gt + 1, close)
  }

  /** "lon,lat[,alt] lon,lat[,alt] ..." → ordinate rows. KML's altitude
    * is the optional THIRD tuple component with default 0
    * (clampToGround): when ANY tuple in a coordinates string carries it,
    * tuples without one take 0.0 and the geometry comes out Z-typed
    * (ISO WKB, the r17 carry-the-ordinate discipline); an all-2D string
    * stays plain 2D. Tuples beyond 3 components refuse loudly.
    */
  private[sources] def parseCoords(s: String): Seq[IndexedSeq[Double]] = {
    val raw = s.trim.split("\\s+").toSeq.filter(_.nonEmpty).map { tup =>
      val parts = tup.split(",")
      require(parts.length == 2 || parts.length == 3,
        s"kml: coordinate tuple '$tup' has ${parts.length} components — " +
          "expected lon,lat or lon,lat,alt")
      parts.map(_.toDouble).toIndexedSeq
    }
    if (raw.exists(_.length == 3)) raw.map(r => if (r.length == 3) r else r :+ 0.0)
    else raw
  }

  /** Pad mixed-Z rings to a uniform dimensionality (a polygon whose
    * outer ring carries altitude but whose hole does not gets 0.0s, the
    * KML default).
    */
  private def unifyZ(rings: Seq[Seq[IndexedSeq[Double]]]): (Seq[Seq[IndexedSeq[Double]]], Boolean) =
    if (rings.exists(_.exists(_.length == 3)))
      (rings.map(_.map(r => if (r.length == 3) r else r :+ 0.0)), true)
    else (rings, false)

  /** Parse the FIRST geometry element in a placemark block to WKB. */
  private[sources] def parseGeometry(block: String): Array[Byte] = {
    def firstIdx(tags: Seq[String]): (String, Int) =
      tags.map(t => t -> block.indexOf(s"<$t>")).filter(_._2 >= 0)
        .sortBy(_._2).headOption.getOrElse((null, -1))
    val (tag, at) = firstIdx(Seq("MultiGeometry", "Point", "LineString", "Polygon"))
    if (tag == null) return null
    parseGeomAt(block, tag, at)
  }

  private def parseGeomAt(s: String, tag: String, at: Int): Array[Byte] = tag match {
    case "Point" =>
      val c = parseCoords(tagContent(s, "coordinates", at))
      Wkb.pointIso(c.head, hasZ = c.head.length == 3, hasM = false)
    case "LineString" =>
      val c = parseCoords(tagContent(s, "coordinates", at))
      Wkb.lineStringIso(c, hasZ = c.exists(_.length == 3), hasM = false)
    case "Polygon" =>
      val end = s.indexOf("</Polygon>", at)
      val body = s.substring(at, if (end < 0) s.length else end)
      val outerB = tagContent(body, "outerBoundaryIs")
      val outer = parseCoords(tagContent(outerB, "coordinates"))
      val holes = scala.collection.mutable.ArrayBuffer.empty[Seq[IndexedSeq[Double]]]
      var from = 0
      var more = true
      while (more) {
        val ib = body.indexOf("<innerBoundaryIs>", from)
        if (ib < 0) more = false
        else {
          holes += parseCoords(tagContent(body, "coordinates", ib))
          from = body.indexOf("</innerBoundaryIs>", ib) match {
            case -1 => body.length
            case e => e + 1
          }
        }
      }
      val (uni, z) = unifyZ(outer +: holes.toSeq)
      Wkb.polygonIso(uni, hasZ = z, hasM = false)
    case "MultiGeometry" =>
      val end = s.indexOf("</MultiGeometry>", at)
      val body = s.substring(s.indexOf('>', at) + 1, if (end < 0) s.length else end)
      val members = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
      var i = 0
      while (i < body.length) {
        val next = Seq("Point", "LineString", "Polygon")
          .map(t => t -> body.indexOf(s"<$t>", i)).filter(_._2 >= 0)
          .sortBy(_._2).headOption
        next match {
          case None => i = body.length
          case Some((t, a)) =>
            members += t -> parseGeomAt(body, t, a)
            i = body.indexOf(s"</$t>", a) match {
              case -1 => body.length
              case e => e + 1
            }
        }
      }
      // homogeneous members → Multi{Point,LineString,Polygon}; mixed → 7
      val code = members.map(_._1).distinct.toSeq match {
        case Seq("Point") => 4
        case Seq("LineString") => 5
        case Seq("Polygon") => 6
        case _ => 7
      }
      Wkb.multi(code, members.map(_._2).toSeq)
  }

  /** `<Data name="k"><value>v</value></Data>` and `<SimpleData name="k">v`
    * pairs, plus `<name>` under the key "name".
    */
  private[sources] def parseProps(block: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def scan(open: String, valueOf: (Int, Int) => Option[(String, Int)]): Unit = {
      var i = 0
      var more = true
      while (more) {
        val at = block.indexOf(open, i)
        if (at < 0) more = false
        else {
          val nameAt = block.indexOf("name=\"", at)
          val gt = block.indexOf('>', at)
          if (nameAt < 0 || gt < 0 || nameAt > gt) { i = at + open.length }
          else {
            val nameEnd = block.indexOf('"', nameAt + 6)
            val key = xmlUnescape(block.substring(nameAt + 6, nameEnd))
            valueOf(at, gt) match {
              case Some((v, cont)) => out(key) = v; i = cont
              case None => i = gt + 1
            }
          }
        }
      }
    }
    scan("<Data", (at, gt) => {
      val v = tagContent(block, "value", gt)
      if (v == null) None
      else Some((xmlUnescape(v), block.indexOf("</Data>", gt) match {
        case -1 => block.length
        case e => e + 1
      }))
    })
    scan("<SimpleData", (at, gt) => {
      val close = block.indexOf("</SimpleData>", gt)
      if (close < 0) None
      else Some((xmlUnescape(block.substring(gt + 1, close)), close + 1))
    })
    val nm = tagContent(block, "name")
    if (nm != null && !out.contains("name")) out("name") = xmlUnescape(nm.trim)
    out.toMap
  }

  /** The Placemark's `id="..."` attribute, or null. */
  private[sources] def parseId(block: String): String = {
    val gt = block.indexOf('>')
    val idAt = block.indexOf("id=\"")
    if (idAt < 0 || idAt > gt) null
    else xmlUnescape(block.substring(idAt + 4, block.indexOf('"', idAt + 4)))
  }

  private val splitUdf = udf { (doc: String) =>
    if (doc == null) Array.empty[String] else splitPlacemarks(doc)
  }

  /** Whole-file KML → the canonical feature envelope (same columns and
    * caller-supplied deterministic event time as [[GeoJson.readSeq]]).
    *
    * @param idField "@id" takes the Placemark id attribute; any other
    *                value looks the feature id up in the parsed props
    */
  def read(spark: SparkSession, path: String, layer: String,
      idField: String = "@id", eventTsUs: Long = 0L): DataFrame = {
    val fidUdf = udf { (block: String) =>
      if (idField == "@id") parseId(block) else parseProps(block).getOrElse(idField, null)
    }
    val geomUdf = udf { (block: String) => parseGeometry(block) }
    val propsUdf = udf { (block: String) => parseProps(block) }
    spark.read.option("wholetext", "true").text(path).toDF("doc")
      .select(explode(splitUdf(col("doc"))).as("block"))
      .select(
        lit(layer).as("layer"),
        fidUdf(col("block")).as("feature_id"),
        geomUdf(col("block")).as("geom_wkb"),
        propsUdf(col("block")).as("props"),
        timestamp_micros(lit(eventTsUs)).as("event_ts"),
        lit(path).as("source"),
        lit(1).as("fmt_version"))
  }
}

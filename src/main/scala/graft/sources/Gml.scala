package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Wkb

/** GML source (SURVEY.md §2 A1 long tail: the fifth vector format after
  * GeoJSON/Shapefile/GPKG/KML — the OGC/WFS interchange XML). Pure-Scala
  * subset parser over the GML 3.2 Simple Features profile shapes real WFS
  * responses use: `<gml:FeatureCollection>` of `<gml:featureMember>`
  * blocks, one feature element per member carrying a `gml:id` attribute,
  * text-only child elements as properties, and a geometry property
  * holding Point (`<gml:pos>x y</gml:pos>`), LineString / LinearRing
  * (`<gml:posList>x1 y1 x2 y2 …</gml:posList>` — FLATTENED, the defining
  * syntactic difference from KML's comma tuples), Polygon
  * (`<gml:exterior>`/`<gml:interior>`), and MultiGeometry
  * (`<gml:geometryMember>` wrappers).
  *
  * Namespace handling (the subset rule, applied once per document): tag
  * prefixes are structural noise for a local-name consumer, so every
  * `<prefix:tag` / `</prefix:tag` is normalized to `<tag` / `</tag`
  * before scanning — one linear pass, and the reason this parser accepts
  * `gml:`, `wfs:`, app-schema, and unprefixed documents alike. Attribute
  * prefixes survive (gml:id is matched both ways). Entity escaping
  * reuses [[Kml.xmlUnescape]]; geometry ADTs reuse [[Kml.KGeom]] so the
  * two XML writers share one caller surface.
  *
  * Scale shape: like KML, one GML document is ONE XML tree — each file is
  * one task and parallelism comes from the file glob (a WFS harvest lands
  * as thousands of per-page .gml files); the member splitter and parser
  * run executor-side, only paths touch the driver.
  */
object Gml {

  import Kml.{KGeom, KPoint, KLine, KPolygon, KMulti}

  // ------------------------------------------------------------ write side
  private def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case '\'' => "&apos;"
    case c => c.toString
  }

  /** GML pos/posList syntax: space-separated ordinates, x before y
    * (srsDimension 2). Double.toString round-trips exactly through
    * toDouble, so write → read preserves coordinates bit-for-bit.
    */
  private def posList(pts: Seq[(Double, Double)]): String =
    pts.map { case (x, y) => s"$x $y" }.mkString(" ")

  private def geomXml(g: KGeom): String = g match {
    case KPoint(x, y) => s"<gml:Point><gml:pos>$x $y</gml:pos></gml:Point>"
    case KLine(pts) =>
      s"<gml:LineString><gml:posList>${posList(pts)}</gml:posList></gml:LineString>"
    case KPolygon(rings) =>
      val outer =
        s"<gml:exterior><gml:LinearRing><gml:posList>${posList(rings.head)}</gml:posList></gml:LinearRing></gml:exterior>"
      val inner = rings.tail.map(r =>
        s"<gml:interior><gml:LinearRing><gml:posList>${posList(r)}</gml:posList></gml:LinearRing></gml:interior>")
        .mkString
      s"<gml:Polygon>$outer$inner</gml:Polygon>"
    case KMulti(members) =>
      s"<gml:MultiGeometry>${members.map(m => s"<gml:geometryMember>${geomXml(m)}</gml:geometryMember>").mkString}</gml:MultiGeometry>"
  }

  /** One feature member: app-schema element named after the layer with a
    * gml:id attribute, key-sorted text properties, then the geometry
    * property (map iteration order must not leak into bytes — the
    * [[Kml.placemarkXml]] discipline).
    */
  private[sources] def memberXml(layer: String, fid: String,
      props: Map[String, String], geom: KGeom): String = {
    val data = props.toSeq.sortBy(_._1).map { case (k, v) =>
      s"<app:${xmlEscape(k)}>${xmlEscape(v)}</app:${xmlEscape(k)}>"
    }.mkString
    s"""<gml:featureMember><app:${xmlEscape(layer)} gml:id="${xmlEscape(fid)}">$data<app:geom>${geomXml(geom)}</app:geom></app:${xmlEscape(layer)}></gml:featureMember>"""
  }

  /** A complete FeatureCollection document. */
  def writeGml(layer: String,
      features: Seq[(String, Map[String, String], KGeom)]): String = {
    val body = features.map { case (fid, props, g) => memberXml(layer, fid, props, g) }
      .mkString("\n")
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<gml:FeatureCollection xmlns:gml=\"http://www.opengis.net/gml/3.2\" " +
      "xmlns:app=\"http://graft.example/app\">\n" + body + "\n</gml:FeatureCollection>\n"
  }

  // ------------------------------------------------------------- read side
  /** Strip namespace prefixes from TAGS (`<x:y` → `<y`, `</x:y` → `</y`)
    * — one linear pass, no regex backtracking; attributes untouched.
    */
  private[sources] def stripPrefixes(doc: String): String = {
    val sb = new java.lang.StringBuilder(doc.length)
    var i = 0
    while (i < doc.length) {
      val c = doc.charAt(i)
      sb.append(c)
      if (c == '<') {
        var j = i + 1
        if (j < doc.length && doc.charAt(j) == '/') { sb.append('/'); j += 1 }
        // scan a name; if a ':' ends it before any delimiter, drop the prefix
        var k = j
        while (k < doc.length && (doc.charAt(k).isLetterOrDigit ||
            doc.charAt(k) == '_' || doc.charAt(k) == '-' || doc.charAt(k) == '.')) k += 1
        if (k < doc.length && doc.charAt(k) == ':') i = k // skip prefix + ':'
        else i = j - 1 // nothing stripped; continue after '<' (and '/')
      }
      i += 1
    }
    sb.toString
  }

  /** Split into `<featureMember>...</featureMember>` blocks (prefix-
    * normalized input; members cannot nest, so a flat scan suffices —
    * comments/CDATA skipped like [[Kml.splitPlacemarks]]).
    */
  private[sources] def splitMembers(doc: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    // jump to the NEAREST of comment / CDATA / member open — skipping to
    // the member directly would resurrect a commented-out feature. Each
    // pattern's next-occurrence pointer advances monotonically and is only
    // re-searched once passed, so the whole split is O(doc) — a fresh
    // 3×indexOf per member would be O(members × doc) (measured: 276 s on
    // the 100k-member sf0.1 fixture vs sub-second with the memo).
    var i = 0
    var cm = doc.indexOf("<!--")
    var cd = doc.indexOf("<![CDATA[")
    var fm = doc.indexOf("<featureMember")
    while (i < doc.length) {
      if (cm >= 0 && cm < i) cm = doc.indexOf("<!--", i)
      if (cd >= 0 && cd < i) cd = doc.indexOf("<![CDATA[", i)
      if (fm >= 0 && fm < i) fm = doc.indexOf("<featureMember", i)
      val next = Seq(cm, cd, fm).filter(_ >= 0).minOption.getOrElse(-1)
      if (next < 0) i = doc.length
      else if (next == cm) {
        val e = doc.indexOf("-->", next); i = if (e < 0) doc.length else e + 3
      } else if (next == cd) {
        val e = doc.indexOf("]]>", next); i = if (e < 0) doc.length else e + 3
      } else {
        val end = doc.indexOf("</featureMember>", next)
        if (end < 0) i = doc.length
        else {
          out += doc.substring(next, end + "</featureMember>".length)
          i = end + "</featureMember>".length
        }
      }
    }
    out.toArray
  }

  private def tagContent(s: String, tag: String, from: Int = 0): String = {
    val open = s.indexOf(s"<$tag", from)
    if (open < 0) return null
    val gt = s.indexOf('>', open)
    if (gt < 0) return null
    val close = s.indexOf(s"</$tag>", gt)
    if (close < 0) return null
    s.substring(gt + 1, close)
  }

  /** "x1 y1 [z1] x2 y2 [z2] ..." (flattened) → ordinate rows of `dim`
    * elements. GML flattens ordinates, so the dimensionality MUST come
    * from the `srsDimension` attribute (default 2) — an ordinate count
    * that is not a multiple of it refuses loudly (a 6-token list is
    * ambiguous between 3×2D and 2×3D without the attribute; guessing
    * would be silently wrong).
    */
  private[sources] def parsePosList(s: String, dim: Int = 2): Seq[IndexedSeq[Double]] = {
    val toks = s.trim.split("\\s+").filter(_.nonEmpty)
    require(toks.length % dim == 0,
      s"gml:posList has ${toks.length} ordinates — not a multiple of srsDimension $dim")
    toks.grouped(dim).map(_.map(_.toDouble).toIndexedSeq).toSeq
  }

  /** `srsDimension` from a pos/posList OPEN TAG (2 when absent; 2 and 3
    * supported — Z ordinates carry into ISO WKB, the r17 discipline).
    */
  private def dimOf(openTag: String): Int = {
    val d = "srsDimension\\s*=\\s*\"(\\d+)\"".r
      .findFirstMatchIn(openTag).map(_.group(1).toInt).getOrElse(2)
    require(d == 2 || d == 3, s"gml: srsDimension $d unsupported (2 or 3)")
    d
  }

  /** (open tag, inner text) of the first `tag` element at/after `from`,
    * or null — [[tagContent]] plus the attributes the caller needs.
    */
  private def tagWithAttrs(s: String, tag: String, from: Int = 0): (String, String) = {
    val open = s.indexOf(s"<$tag", from)
    if (open < 0) return null
    val gt = s.indexOf('>', open)
    if (gt < 0) return null
    val close = s.indexOf(s"</$tag>", gt)
    if (close < 0) return null
    (s.substring(open, gt + 1), s.substring(gt + 1, close))
  }

  /** Parse the first pos/posList at/after `from` into (rows, hasZ). */
  private def posRows(s: String, tag: String, from: Int): (Seq[IndexedSeq[Double]], Boolean) = {
    val oc = tagWithAttrs(s, tag, from)
    require(oc != null, s"gml: no <$tag> element found")
    val dim = dimOf(oc._1)
    (parsePosList(oc._2, dim), dim == 3)
  }

  private def parseGeomAt(s: String, tag: String, at: Int): Array[Byte] = tag match {
    case "Point" =>
      val (rows, z) = posRows(s, "pos", at)
      Wkb.pointIso(rows.head, hasZ = z, hasM = false)
    case "LineString" =>
      val (rows, z) = posRows(s, "posList", at)
      Wkb.lineStringIso(rows, hasZ = z, hasM = false)
    case "Polygon" =>
      val end = s.indexOf("</Polygon>", at)
      val body = s.substring(at, if (end < 0) s.length else end)
      val (outer, zOut) = posRows(tagContent(body, "exterior"), "posList", 0)
      val holes = scala.collection.mutable.ArrayBuffer.empty[(Seq[IndexedSeq[Double]], Boolean)]
      var from = 0
      var more = true
      while (more) {
        val ib = body.indexOf("<interior>", from)
        if (ib < 0) more = false
        else {
          holes += posRows(body, "posList", ib)
          from = body.indexOf("</interior>", ib) match {
            case -1 => body.length
            case e => e + 1
          }
        }
      }
      // rings must agree on dimensionality — a 2D hole in a 3D shell has
      // no defined Z and guessing would be silently wrong
      require(holes.forall(_._2 == zOut),
        "gml: polygon rings mix srsDimension 2 and 3 — refusing")
      Wkb.polygonIso(outer +: holes.toSeq.map(_._1), hasZ = zOut, hasM = false)
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
      val code = members.map(_._1).distinct.toSeq match {
        case Seq("Point") => 4
        case Seq("LineString") => 5
        case Seq("Polygon") => 6
        case _ => 7
      }
      Wkb.multi(code, members.map(_._2).toSeq)
  }

  /** First geometry element in a member block → WKB. */
  private[sources] def parseGeometry(block: String): Array[Byte] = {
    val hit = Seq("MultiGeometry", "Point", "LineString", "Polygon")
      .map(t => t -> block.indexOf(s"<$t>")).filter(_._2 >= 0)
      .sortBy(_._2).headOption
    hit match {
      case None => null
      case Some((tag, at)) => parseGeomAt(block, tag, at)
    }
  }

  /** The feature element's gml:id (attribute prefix survives prefix
    * stripping, so match both spellings), or null.
    */
  private[sources] def parseId(block: String): String = {
    // the feature element is the first tag INSIDE the featureMember
    val inner = block.indexOf('<', block.indexOf('>') + 1)
    if (inner < 0) return null
    val gt = block.indexOf('>', inner)
    val head = block.substring(inner, if (gt < 0) block.length else gt)
    val at = head.indexOf("gml:id=\"") match {
      case -1 => head.indexOf("id=\"") match {
        case -1 => -1
        case a => a + 4
      }
      case a => a + 8
    }
    if (at < 0) null
    else Kml.xmlUnescape(head.substring(at, head.indexOf('"', at)))
  }

  /** Text-only child elements as properties: a `<k>v</k>` whose content
    * has no markup is a property; anything containing nested tags (the
    * geometry property) is skipped.
    */
  private[sources] def parseProps(block: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = block.indexOf('>', block.indexOf('<', block.indexOf('>') + 1)) + 1
    while (i > 0 && i < block.length) {
      val open = block.indexOf('<', i)
      if (open < 0 || block.startsWith("</", open)) i = -1
      else {
        var k = open + 1
        while (k < block.length && (block.charAt(k).isLetterOrDigit ||
            block.charAt(k) == '_' || block.charAt(k) == '-' || block.charAt(k) == '.')) k += 1
        val tag = block.substring(open + 1, k)
        val gt = block.indexOf('>', open)
        val close = block.indexOf(s"</$tag>", gt)
        if (tag.isEmpty || gt < 0 || close < 0) i = -1
        else {
          val content = block.substring(gt + 1, close)
          if (!content.contains('<'))
            out(Kml.xmlUnescape(tag)) = Kml.xmlUnescape(content)
          i = close + tag.length + 3
        }
      }
    }
    out.toMap
  }

  private val splitUdf = udf { (doc: String) =>
    if (doc == null) Array.empty[String] else splitMembers(stripPrefixes(doc))
  }

  /** Whole-file GML → the canonical feature envelope (same columns and
    * caller-supplied deterministic event time as [[Kml.read]]).
    *
    * @param idField "@id" takes the feature element's gml:id attribute;
    *                any other value looks the id up in the parsed props
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

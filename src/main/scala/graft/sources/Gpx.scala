package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Wkb

/** GPX source (SURVEY.md §2 A1 long tail: the reference's producer reads
  * vector files via OGR [UPSTREAM-UNVERIFIED]; GPX is the GPS-track
  * interchange format every field-survey / fleet-tracking ingest meets —
  * the UKIS geodata use case's moving-sensor sibling to KML's static
  * exports). Pure-Scala XML subset parser — no scala-xml, no native deps —
  * handling the grammar real GPX 1.1 uses: `<wpt lat=".." lon="..">`
  * waypoints (self-closing or with text children), `<trk>` tracks whose
  * `<trkseg>` segments each become a LineString (one segment →
  * LINESTRING, several → MULTILINESTRING — a paused GPS logger produces
  * multi-segment tracks), and `<rte>` routes. Text-only children (name,
  * desc, type, cmt, sym) become props; `ele`/`time` per-point children
  * are skipped (2D engine — the KML altitude discipline).
  *
  * The classic GPX gotcha is handled where it lives: coordinates are
  * ATTRIBUTES in (lat, lon) order — the exact transpose of KML's
  * "lon,lat" text — and both attributes are looked up BY NAME, so
  * attribute order in the file is irrelevant. Double.toString →
  * toDouble round-trips exactly, so write → read preserves coordinates
  * bit-for-bit.
  *
  * Scale shape: a GPX document is ONE XML tree — inherently not
  * line-splittable — so like [[Kml.read]] each file is one task and
  * parallelism comes from the file GLOB (a real tracking ingest lands as
  * thousands of per-device .gpx files). The feature splitter and the
  * per-feature parser both run executor-side (wholetext scan → split UDF
  * → explode → parse UDFs); only file paths touch the driver.
  */
object Gpx {

  // ------------------------------------------------------------ write side
  /** One waypoint per tuple: (feature name, props, point). Props with the
    * reserved GPX child-element names (desc/type/cmt/sym) are written as
    * those elements; everything else rides `<extensions>` as text-only
    * elements. Keys are emitted sorted (map iteration order must not leak
    * into bytes — the GeoJson write-side discipline).
    */
  def writeGpxWaypoints(wpts: Seq[(String, Map[String, String], Kml.KPoint)]): String = {
    val reserved = Set("desc", "type", "cmt", "sym")
    val body = wpts.map { case (name, props, Kml.KPoint(x, y)) =>
      val known = props.filter(p => reserved(p._1)).toSeq.sortBy(_._1)
        .map { case (k, v) => s"<$k>${Kml.xmlEscape(v)}</$k>" }.mkString
      val ext = props.filterNot(p => reserved(p._1)).toSeq.sortBy(_._1)
        .map { case (k, v) => s"<${k}>${Kml.xmlEscape(v)}</${k}>" }.mkString
      val extBlock = if (ext.isEmpty) "" else s"<extensions>$ext</extensions>"
      s"""<wpt lat="$y" lon="$x"><name>${Kml.xmlEscape(name)}</name>$known$extBlock</wpt>"""
    }.mkString("\n")
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<gpx version=\"1.1\" creator=\"graft\" xmlns=\"http://www.topografix.com/GPX/1/1\">\n" +
      body + "\n</gpx>\n"
  }

  /** One `<trk>` per tuple: (name, props, segments). */
  def writeGpxTracks(trks: Seq[(String, Map[String, String], Seq[Seq[(Double, Double)]])]): String = {
    val body = trks.map { case (name, props, segs) =>
      val meta = props.toSeq.sortBy(_._1)
        .map { case (k, v) => s"<$k>${Kml.xmlEscape(v)}</$k>" }.mkString
      val segXml = segs.map { seg =>
        "<trkseg>" + seg.map { case (x, y) => s"""<trkpt lat="$y" lon="$x"/>""" }.mkString + "</trkseg>"
      }.mkString
      s"<trk><name>${Kml.xmlEscape(name)}</name>$meta$segXml</trk>"
    }.mkString("\n")
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
      "<gpx version=\"1.1\" creator=\"graft\" xmlns=\"http://www.topografix.com/GPX/1/1\">\n" +
      body + "\n</gpx>\n"
  }

  // ------------------------------------------------------------- read side
  /** Split a GPX document into raw feature blocks: every top-level
    * `<wpt ...>` (self-closing or paired), `<trk>`, `<rte>`. GPX forbids
    * nesting a feature element inside another of the same kind, so a flat
    * scan suffices; comments and CDATA are skipped so a commented-out
    * feature is not resurrected (the [[Kml.splitPlacemarks]] discipline).
    * `<trkpt>`/`<rtept>` only ever appear INSIDE a trk/rte block, so the
    * scanner jumps past each matched block in one step and never sees
    * them as top-level candidates.
    */
  private[sources] def splitFeatures(doc: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < doc.length) {
      if (doc.startsWith("<!--", i)) {
        val e = doc.indexOf("-->", i); i = if (e < 0) doc.length else e + 3
      } else if (doc.startsWith("<![CDATA[", i)) {
        val e = doc.indexOf("]]>", i); i = if (e < 0) doc.length else e + 3
      } else {
        val hit = Seq("wpt", "trk", "rte").find { t =>
          doc.startsWith(s"<$t", i) && {
            val c = if (i + t.length + 1 < doc.length) doc.charAt(i + t.length + 1) else ' '
            c == '>' || c == '/' || c.isWhitespace
          }
        }
        hit match {
          case Some(t) =>
            val gt = doc.indexOf('>', i)
            if (gt < 0) i = doc.length
            else if (doc.charAt(gt - 1) == '/') { // self-closing <wpt .../>
              out += doc.substring(i, gt + 1); i = gt + 1
            } else {
              val close = doc.indexOf(s"</$t>", gt)
              if (close < 0) i = doc.length
              else { out += doc.substring(i, close + t.length + 3); i = close + t.length + 3 }
            }
          case None => i += 1
        }
      }
    }
    out.toArray
  }

  /** Attribute value `name="..."` within the element's OPEN TAG only.
    * The match must start at a whitespace boundary so `lat=` can never
    * bind to the tail of a `maxlat=` bounds attribute.
    */
  private def attr(block: String, name: String): String = {
    val gt = block.indexOf('>')
    var at = block.indexOf(name + "=\"")
    while (at > 0 && !block.charAt(at - 1).isWhitespace)
      at = block.indexOf(name + "=\"", at + 1)
    if (at < 0 || (gt >= 0 && at > gt)) return null
    val end = block.indexOf('"', at + name.length + 2)
    if (end < 0) null else block.substring(at + name.length + 2, end)
  }

  /** First content of `<tag>...</tag>` after `from`, or null. */
  private def tagContent(s: String, tag: String, from: Int = 0): String = {
    val open = s.indexOf(s"<$tag>", from)
    if (open < 0) return null
    val close = s.indexOf(s"</$tag>", open)
    if (close < 0) return null
    s.substring(open + tag.length + 2, close)
  }

  /** `<ele>` child of a PAIRED point element (between its open tag end
    * and its close tag), if present — GPX elevation rides as a child
    * element, unlike KML's in-tuple altitude.
    */
  private def eleOf(s: String, selfClosing: Boolean, openEnd: Int,
      pt: String, until: Int): Option[Double] =
    if (selfClosing) None
    else {
      val close = s.indexOf(s"</$pt>", openEnd)
      val stop = if (close < 0 || close > until) until else close
      val ea = s.indexOf("<ele>", openEnd)
      if (ea < 0 || ea >= stop) None
      else {
        val ee = s.indexOf("</ele>", ea)
        if (ee < 0 || ee >= stop) None
        else Some(s.substring(ea + 5, ee).trim.toDouble)
      }
    }

  /** All `<pt lat=".." lon="..">` point elements inside `s` between
    * `from` and `until`, in document order, each with its optional
    * `<ele>` elevation.
    */
  private def scanPoints(s: String, pt: String, from: Int,
      until: Int): Seq[(Double, Double, Option[Double])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Option[Double])]
    var i = from
    while (i >= 0 && i < until) {
      val at = s.indexOf(s"<$pt", i)
      if (at < 0 || at >= until) i = -1
      else {
        val gt = s.indexOf('>', at)
        val open = s.substring(at, if (gt < 0) until else gt + 1)
        val la = attr(open, "lat"); val lo = attr(open, "lon")
        if (la != null && lo != null)
          out += ((lo.toDouble, la.toDouble,
            eleOf(s, open.endsWith("/>"), if (gt < 0) until else gt + 1, pt, until)))
        i = if (gt < 0) -1 else gt + 1
      }
    }
    out.toSeq
  }

  /** Elevation-carry policy (deliberately NOT KML's): a chain is Z-typed
    * only when EVERY point carries `<ele>` — GPX's absent elevation means
    * UNKNOWN (GPS dropout), and unknown is not 0.0; a mixed chain stays
    * 2D rather than inventing sea-level fixes.
    */
  private def lineOf(pts: Seq[(Double, Double, Option[Double])]): Array[Byte] =
    if (pts.nonEmpty && pts.forall(_._3.isDefined))
      Wkb.lineStringIso(pts.map(p => IndexedSeq(p._1, p._2, p._3.get)),
        hasZ = true, hasM = false)
    else Wkb.lineString(pts.map(p => (p._1, p._2)))

  /** Parse one feature block to WKB: wpt → POINT; rte → LINESTRING;
    * trk → LINESTRING (one trkseg) or MULTILINESTRING (several).
    */
  private[sources] def parseGeometry(block: String): Array[Byte] = {
    if (block.startsWith("<wpt")) {
      val gt = block.indexOf('>')
      val open = block.substring(0, if (gt < 0) block.length else gt + 1)
      val la = attr(open, "lat"); val lo = attr(open, "lon")
      if (la == null || lo == null) null
      else eleOf(block, open.endsWith("/>"),
          if (gt < 0) block.length else gt + 1, "wpt", block.length) match {
        case Some(z) => Wkb.pointIso(
          IndexedSeq(lo.toDouble, la.toDouble, z), hasZ = true, hasM = false)
        case None => Wkb.point(lo.toDouble, la.toDouble)
      }
    } else if (block.startsWith("<rte")) {
      lineOf(scanPoints(block, "rtept", 0, block.length))
    } else if (block.startsWith("<trk")) {
      val segs = scala.collection.mutable.ArrayBuffer.empty[Seq[(Double, Double, Option[Double])]]
      var i = 0
      var more = true
      while (more) {
        val at = block.indexOf("<trkseg", i)
        if (at < 0) more = false
        else {
          val end = block.indexOf("</trkseg>", at) match {
            case -1 => block.length
            case e => e
          }
          val pts = scanPoints(block, "trkpt", at, end)
          if (pts.nonEmpty) segs += pts
          i = end + 1
        }
      }
      if (segs.isEmpty) null
      else if (segs.length == 1) lineOf(segs.head)
      else Wkb.multi(5, segs.toSeq.map(lineOf))
    } else null
  }

  /** Text-only metadata children (name/desc/type/cmt/sym) plus any
    * text-only elements under `<extensions>`, entity-unescaped. Children
    * of trkseg/rtept sub-trees never match because these tags only occur
    * at feature level in the subset we emit and the lookups are by exact
    * element name.
    */
  private[sources] def parseProps(block: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (t <- Seq("name", "desc", "type", "cmt", "sym")) {
      val v = tagContent(block, t)
      if (v != null && !v.contains('<')) out(t) = Kml.xmlUnescape(v.trim)
    }
    val ext = tagContent(block, "extensions")
    if (ext != null) {
      var i = 0
      while (i < ext.length) {
        val lt = ext.indexOf('<', i)
        if (lt < 0 || lt + 1 >= ext.length || ext.charAt(lt + 1) == '/') {
          i = if (lt < 0) ext.length else lt + 1
        } else {
          val gt = ext.indexOf('>', lt)
          if (gt < 0) i = ext.length
          else {
            val tag = ext.substring(lt + 1, gt).takeWhile(c => !c.isWhitespace && c != '/')
            val v = tagContent(ext, tag, lt)
            if (v != null && !v.contains('<')) out(tag) = Kml.xmlUnescape(v.trim)
            i = ext.indexOf(s"</$tag>", gt) match {
              case -1 => gt + 1
              case e => e + tag.length + 3
            }
          }
        }
      }
    }
    out.toMap
  }

  private val splitUdf = udf { (doc: String) =>
    if (doc == null) Array.empty[String] else splitFeatures(doc)
  }

  /** Whole-file GPX → the canonical feature envelope (same columns and
    * caller-supplied deterministic event time as [[GeoJson.readSeq]]).
    *
    * @param idField property key holding the feature id ("name" is the
    *                GPX-native choice — the format has no id attribute)
    */
  def read(spark: SparkSession, path: String, layer: String,
      idField: String = "name", eventTsUs: Long = 0L): DataFrame = {
    val fidUdf = udf { (block: String) => parseProps(block).getOrElse(idField, null) }
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

package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Wkb

/** Envelope row emitted by [[Shapefile.read]] — top-level so the encoder
  * codegen can call the constructor (a private nested case class makes
  * the deserializer fall back to interpreted eval).
  */
case class ShpFeature(layer: String, feature_id: String,
    geom_wkb: Array[Byte], props: Map[String, String], event_ts_us: Long,
    source: String, fmt_version: Int)

/** Pure-Scala ESRI Shapefile source (SURVEY.md §2 A1: the reference's
  * producer reads vector files — Shapefile is its primary OGR format
  * [UPSTREAM-UNVERIFIED]; format per the public ESRI whitepaper
  * "ESRI Shapefile Technical Description", 1998).
  *
  * Scope: the mainline shape types — Point (1), PolyLine (3), Polygon
  * (5) — plus Null (0), AND the measured/3D family common in surveyed
  * data: PointZ/PolyLineZ/PolygonZ (11/13/15, Z always + the spec's
  * OPTIONAL M block) and PointM/PolyLineM/PolygonM (21/23/25).
  * Attributes come from the sibling dBASE `.dbf`. Geometry converts to
  * the engine's WKB via the [[Wkb]] builders — Z/M ordinates are
  * CARRIED (ISO-typed WKB, XYZ/XYM/XYZM), not dropped: every Wkb
  * consumer already skips extra dims for XY ops, and an all-NoData M
  * block (every value < −10³⁸, the spec sentinel) drops the M dimension
  * since it carries no information. A multi-part PolyLine becomes a WKB
  * MultiLineString and a Polygon record's parts become that polygon's
  * rings (outer + holes — the common single-outer-ring layout;
  * multi-outer records would need the ring-orientation disambiguation
  * the spec leaves to readers).
  *
  * Scale shape: a `.shp` has variable-length records and NO sync marks,
  * so a single file is not splittable without its `.shx` index — each
  * `.shp`/`.dbf` pair is one task (`binaryFile` scan + a pair join on
  * the file stem). This is the interop/ingest-edge path, exactly like
  * [[GeoJson.readCollection]]: bulk 100 TB ingest standardizes on
  * splittable forms (GeoJSONSeq, parquet) after one such pass; many
  * small shapefiles still parallelize per-file.
  *
  * The writer half exists for fixtures and tests (a deterministic
  * engine-written `.shp`/`.dbf` pair is what lets the `a1b_shp_scan`
  * oracle hash-check the read path end-to-end); it writes Char-type
  * DBF fields only — attribute values round-trip as trimmed strings,
  * matching the envelope's `props: map<string,string>`.
  */
object Shapefile {

  /** The spec's "no data" floor for measures: any M < −10³⁸ is absent. */
  private val ShpNoData = -1e38

  /** Typed shapes for the writer (the reader emits WKB directly). The Z/M
    * members mirror the measured/3D record layouts (types 11/13/15/21/23)
    * — Z shapes carry an optional per-record M block, exactly the wild
    * forms surveyed data ships.
    */
  sealed trait Shape
  final case class PointS(x: Double, y: Double) extends Shape
  final case class PolyLineS(parts: Seq[Seq[(Double, Double)]]) extends Shape
  final case class PolygonS(rings: Seq[Seq[(Double, Double)]]) extends Shape
  /** PointZ (11): z always present, m optional (the spec's optional block). */
  final case class PointZS(x: Double, y: Double, z: Double,
      m: Option[Double] = None) extends Shape
  /** PolyLineZ (13): per-point (x, y, z); no M block. */
  final case class PolyLineZS(parts: Seq[Seq[(Double, Double, Double)]]) extends Shape
  /** PolygonZ (15): per-point (x, y, z); no M block. */
  final case class PolygonZS(rings: Seq[Seq[(Double, Double, Double)]]) extends Shape
  /** PointM (21). */
  final case class PointMS(x: Double, y: Double, m: Double) extends Shape
  /** PolyLineM (23): per-point (x, y, m). */
  final case class PolyLineMS(parts: Seq[Seq[(Double, Double, Double)]]) extends Shape

  // ------------------------------------------------------------- .shp write

  private def shapeType(s: Shape): Int = s match {
    case _: PointS => 1
    case _: PolyLineS => 3
    case _: PolygonS => 5
    case _: PointZS => 11
    case _: PolyLineZS => 13
    case _: PolygonZS => 15
    case _: PointMS => 21
    case _: PolyLineMS => 23
  }

  private def contentBytes(s: Shape): Array[Byte] = s match {
    case PointS(x, y) =>
      val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1).putDouble(x).putDouble(y)
      b.array()
    case PointZS(x, y, z, m) =>
      val b = ByteBuffer.allocate(28 + m.map(_ => 8).getOrElse(0))
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(11).putDouble(x).putDouble(y).putDouble(z)
      m.foreach(b.putDouble)
      b.array()
    case PointMS(x, y, m) =>
      val b = ByteBuffer.allocate(28).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(21).putDouble(x).putDouble(y).putDouble(m)
      b.array()
    case other =>
      // multipart layouts share a prefix: type, bbox, counts, part
      // offsets, XY points — then Z/M blocks of (min, max, values)
      val (parts3, tpe) = other match {
        case PolyLineS(p) => (p.map(_.map(t => (t._1, t._2, 0.0))), 3)
        case PolygonS(r) => (r.map(_.map(t => (t._1, t._2, 0.0))), 5)
        case PolyLineZS(p) => (p, 13)
        case PolygonZS(r) => (r, 15)
        case PolyLineMS(p) => (p, 23)
        case _ => throw new MatchError(other)
      }
      val extra = tpe > 5 // one trailing ordinate block (Z for 13/15, M for 23)
      val npts = parts3.map(_.length).sum
      val b = ByteBuffer.allocate(4 + 32 + 8 + 4 * parts3.length + 16 * npts +
          (if (extra) 16 + 8 * npts else 0))
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(tpe)
      val xs = parts3.flatten.map(_._1); val ys = parts3.flatten.map(_._2)
      b.putDouble(xs.min).putDouble(ys.min).putDouble(xs.max).putDouble(ys.max)
      b.putInt(parts3.length).putInt(npts)
      var off = 0
      parts3.foreach { p => b.putInt(off); off += p.length }
      parts3.flatten.foreach { case (x, y, _) => b.putDouble(x).putDouble(y) }
      if (extra) {
        val os = parts3.flatten.map(_._3)
        b.putDouble(os.min).putDouble(os.max)
        os.foreach(b.putDouble)
      }
      b.array()
  }

  /** Serialize shapes into one `.shp` byte stream (header + records). */
  def writeShp(shapes: Seq[Shape]): Array[Byte] = {
    require(shapes.nonEmpty, "shapefile must hold at least one record")
    require(shapes.map(shapeType).distinct.length == 1,
      "a .shp holds exactly one shape type")
    val contents = shapes.map(contentBytes)
    val totalWords = 50 + contents.map(c => 4 + c.length / 2).sum
    val out = ByteBuffer.allocate(totalWords * 2)
    // header: big-endian magic + length, little-endian version/type/bbox
    out.order(ByteOrder.BIG_ENDIAN).putInt(9994)
    (0 until 5).foreach(_ => out.putInt(0))
    out.putInt(totalWords)
    out.order(ByteOrder.LITTLE_ENDIAN).putInt(1000).putInt(shapeType(shapes.head))
    val boxes = shapes.map { s => Wkb.bbox(wkbOf(s)) }
    out.putDouble(boxes.map(_.xmin).min).putDouble(boxes.map(_.ymin).min)
    out.putDouble(boxes.map(_.xmax).max).putDouble(boxes.map(_.ymax).max)
    (0 until 4).foreach(_ => out.putDouble(0.0)) // Z/M ranges unused
    contents.zipWithIndex.foreach { case (c, i) =>
      out.order(ByteOrder.BIG_ENDIAN).putInt(i + 1).putInt(c.length / 2)
      out.order(ByteOrder.LITTLE_ENDIAN).put(c)
    }
    out.array()
  }

  private def wkbOf(s: Shape): Array[Byte] = s match {
    case PointS(x, y) => Wkb.point(x, y)
    case PolyLineS(parts) =>
      if (parts.length == 1) Wkb.lineString(parts.head)
      else Wkb.multi(5, parts.map(Wkb.lineString))
    case PolygonS(rings) => Wkb.polygon(rings)
    case PointZS(x, y, z, m) => m match {
      case Some(mv) => Wkb.pointIso(Vector(x, y, z, mv), hasZ = true, hasM = true)
      case None => Wkb.pointIso(Vector(x, y, z), hasZ = true, hasM = false)
    }
    case PointMS(x, y, m) => Wkb.pointIso(Vector(x, y, m), hasZ = false, hasM = true)
    case PolyLineZS(parts) =>
      val ps = parts.map(_.map(t => Vector(t._1, t._2, t._3)))
      if (ps.length == 1) Wkb.lineStringIso(ps.head, hasZ = true, hasM = false)
      else Wkb.multiIso(5, hasZ = true, hasM = false,
        ps.map(Wkb.lineStringIso(_, hasZ = true, hasM = false)))
    case PolygonZS(rings) =>
      Wkb.polygonIso(rings.map(_.map(t => Vector(t._1, t._2, t._3))),
        hasZ = true, hasM = false)
    case PolyLineMS(parts) =>
      val ps = parts.map(_.map(t => Vector(t._1, t._2, t._3)))
      if (ps.length == 1) Wkb.lineStringIso(ps.head, hasZ = false, hasM = true)
      else Wkb.multiIso(5, hasZ = false, hasM = true,
        ps.map(Wkb.lineStringIso(_, hasZ = false, hasM = true)))
  }

  // ------------------------------------------------------------- .shp parse

  /** Parse `.shp` bytes → (1-based record number, WKB geometry); Null
    * shapes (type 0) carry a null geometry.
    */
  def parseShp(bytes: Array[Byte]): Seq[(Int, Array[Byte])] = {
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994, "not a shapefile: bad magic")
    val fileWords = buf.getInt(24)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    var pos = 100
    val end = math.min(fileWords * 2, bytes.length)
    while (pos + 8 <= end) {
      buf.order(ByteOrder.BIG_ENDIAN)
      val recNo = buf.getInt(pos)
      val contentWords = buf.getInt(pos + 4)
      val cstart = pos + 8
      buf.order(ByteOrder.LITTLE_ENDIAN)
      val tpe = buf.getInt(cstart)
      val contentEnd = cstart + contentWords * 2
      val wkb: Array[Byte] = tpe match {
        case 0 => null
        case 1 => Wkb.point(buf.getDouble(cstart + 4), buf.getDouble(cstart + 12))
        case 11 => // PointZ: x y z [m] — the M block is optional per spec
          val x = buf.getDouble(cstart + 4); val y = buf.getDouble(cstart + 12)
          val z = buf.getDouble(cstart + 20)
          val m = if (contentEnd - cstart >= 36) Some(buf.getDouble(cstart + 28)) else None
          m.filter(_ > ShpNoData) match {
            case Some(mv) => Wkb.pointIso(Vector(x, y, z, mv), hasZ = true, hasM = true)
            case None => Wkb.pointIso(Vector(x, y, z), hasZ = true, hasM = false)
          }
        case 21 => // PointM: x y m
          val x = buf.getDouble(cstart + 4); val y = buf.getDouble(cstart + 12)
          val m = buf.getDouble(cstart + 20)
          if (m > ShpNoData) Wkb.pointIso(Vector(x, y, m), hasZ = false, hasM = true)
          else Wkb.point(x, y) // all-NoData measure: plain 2D
        case 3 | 5 | 13 | 15 | 23 | 25 =>
          val nParts = buf.getInt(cstart + 36)
          val nPts = buf.getInt(cstart + 40)
          require(nParts > 0 && nPts > 0,
            s"shapefile: record $recNo (type $tpe) has $nParts parts / $nPts points")
          val partOff = (0 until nParts).map(i => buf.getInt(cstart + 44 + 4 * i))
          val ptsStart = cstart + 44 + 4 * nParts
          val pts = (0 until nPts).map(i =>
            (buf.getDouble(ptsStart + 16 * i), buf.getDouble(ptsStart + 16 * i + 8)))
          val bounds = partOff :+ nPts
          // trailing ordinate blocks, each (min, max, values[nPts]): Z
          // types carry Z then an OPTIONAL M block; M types carry M only
          val xyEnd = ptsStart + 16 * nPts
          def block(at: Int): IndexedSeq[Double] =
            (0 until nPts).map(i => buf.getDouble(at + 16 + 8 * i))
          val zs: Option[IndexedSeq[Double]] =
            if (tpe == 13 || tpe == 15) Some(block(xyEnd)) else None
          val mAt = if (tpe == 13 || tpe == 15) xyEnd + 16 + 8 * nPts else xyEnd
          // the M block is OPTIONAL for every measured multipart type
          // (spec: presence detected from record length) — reading it
          // unconditionally for 23/25 would overrun into the next record
          // on wild files that omit it
          val msRaw: Option[IndexedSeq[Double]] =
            if (tpe > 5 && contentEnd - mAt >= 16 + 8 * nPts) Some(block(mAt))
            else None
          // an all-NoData M block carries no information — drop the dim
          val ms = msRaw.filter(_.exists(_ > ShpNoData))
          val hasZ = zs.nonEmpty; val hasM = ms.nonEmpty
          val rows: IndexedSeq[IndexedSeq[Double]] = (0 until nPts).map { i =>
            val base = Vector(pts(i)._1, pts(i)._2)
            val withZ = zs.map(z => base :+ z(i)).getOrElse(base)
            ms.map(m => withZ :+ m(i)).getOrElse(withZ)
          }
          val parts = bounds.sliding(2).map { w => rows.slice(w(0), w(1)) }.toSeq
          if (tpe == 5 || tpe == 15 || tpe == 25) Wkb.polygonIso(parts, hasZ, hasM)
          else if (parts.length == 1) Wkb.lineStringIso(parts.head, hasZ, hasM)
          else Wkb.multiIso(5, hasZ, hasM,
            parts.map(Wkb.lineStringIso(_, hasZ, hasM)))
        case other =>
          throw new IllegalArgumentException(s"shapefile: unsupported shape type $other")
      }
      out += ((recNo, wkb))
      pos = cstart + contentWords * 2
    }
    out.toSeq
  }

  // ------------------------------------------------------------------- .dbf

  /** Write a dBASE III `.dbf` with Char fields only: (name, width) +
    * string rows. The header's last-update date is FIXED (not
    * wall-clock) so fixture bytes are deterministic across runs.
    */
  def writeDbf(fields: Seq[(String, Int)], rows: Seq[Seq[String]]): Array[Byte] = {
    require(fields.forall(_._1.length <= 10), "dbf field names are ≤10 bytes")
    val headerSize = 32 + 32 * fields.length + 1
    val recordSize = 1 + fields.map(_._2).sum
    val out = ByteBuffer.allocate(headerSize + recordSize * rows.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(0x03.toByte).put(95.toByte).put(7.toByte).put(26.toByte)
    out.putInt(rows.length)
    out.putShort(headerSize.toShort).putShort(recordSize.toShort)
    out.position(32)
    fields.foreach { case (name, width) =>
      val desc = new Array[Byte](32)
      val nb = name.getBytes("US-ASCII")
      System.arraycopy(nb, 0, desc, 0, nb.length)
      desc(11) = 'C'
      desc(16) = width.toByte
      out.put(desc)
    }
    out.put(0x0D.toByte)
    rows.foreach { row =>
      out.put(' '.toByte) // not-deleted flag
      row.zip(fields).foreach { case (v, (_, width)) =>
        val padded = (if (v == null) "" else v).take(width).padTo(width, ' ')
        out.put(padded.getBytes("US-ASCII"))
      }
    }
    out.put(0x1A.toByte) // EOF
    out.array()
  }

  /** Parse `.dbf` bytes → (field names, rows of trimmed string values).
    * Char and Numeric fields both surface as strings (the envelope's
    * props map is string-typed); deleted records ('*' flag) are skipped.
    */
  def parseDbf(bytes: Array[Byte]): (Seq[String], Seq[Seq[String]]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xFFFF
    val recordSize = buf.getShort(10) & 0xFFFF
    val fields = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    var fpos = 32
    while (fpos + 32 <= headerSize && bytes(fpos) != 0x0D) {
      var nameEnd = fpos
      while (nameEnd < fpos + 11 && bytes(nameEnd) != 0) nameEnd += 1
      val name = new String(bytes, fpos, nameEnd - fpos, "US-ASCII")
      fields += ((name, bytes(fpos + 16) & 0xFF))
      fpos += 32
    }
    val rows = (0 until nRec).flatMap { r =>
      val rpos = headerSize + r.toLong * recordSize
      if (rpos + recordSize > bytes.length || bytes(rpos.toInt) == '*') None
      else {
        var off = rpos.toInt + 1
        Some(fields.toSeq.map { case (_, width) =>
          val v = new String(bytes, off, width, "US-ASCII").trim
          off += width
          v
        })
      }
    }
    (fields.toSeq.map(_._1), rows)
  }

  // ------------------------------------------------------------ Spark read

  /** Shapefile glob → the canonical feature envelope ([[GeoJson]]'s
    * contract: layer, feature_id, geom_wkb, props, event_ts, source,
    * fmt_version). `pathGlob` matches the `.shp` files; each sibling
    * `.dbf` (same stem) supplies feature_id (`idField`) and props.
    * One task per file pair (see the scaladoc's splittability note);
    * the stem join is a broadcast-sized file-listing join, not data.
    */
  def read(spark: SparkSession, pathGlob: String, layer: String,
      idField: String, eventTsUs: Long = 0L): DataFrame = {
    import spark.implicits._
    require(pathGlob.endsWith(".shp"), "pass the .shp glob; .dbf is derived")
    val stemOf = regexp_replace(input_file_name(), "\\.(shp|dbf)$", "")
    val shp = spark.read.format("binaryFile").load(pathGlob)
      .select(stemOf.as("stem"), $"content".as("shp_bytes"))
    val dbf = spark.read.format("binaryFile")
      .load(pathGlob.stripSuffix(".shp") + ".dbf")
      .select(stemOf.as("stem"), $"content".as("dbf_bytes"))
    // left-outer, not inner: an unpaired .shp must fail LOUDLY inside its
    // task (an inner join would silently drop the whole file's features)
    val paired = shp.join(dbf, Seq("stem"), "left_outer")
      .as[(String, Array[Byte], Array[Byte])]
    paired.flatMap { case (stem, shpBytes, dbfBytes) =>
      require(dbfBytes != null, s"shapefile: no sibling .dbf for $stem.shp")
      val geoms = parseShp(shpBytes)
      val (names, rows) = parseDbf(dbfBytes)
      val idIdx = names.indexOf(idField)
      require(idIdx >= 0, s"shapefile: id field $idField not in ${names.mkString(",")}")
      require(geoms.length == rows.length,
        s"shapefile: ${geoms.length} shapes vs ${rows.length} dbf records at $stem")
      geoms.zip(rows).map { case ((_, wkb), attrs) =>
        ShpFeature(layer, attrs(idIdx), wkb, names.zip(attrs).toMap,
          eventTsUs, stem + ".shp", 1)
      }
    }.toDF()
      .select($"layer", $"feature_id", $"geom_wkb", $"props",
        timestamp_micros($"event_ts_us").as("event_ts"), $"source", $"fmt_version")
  }
}

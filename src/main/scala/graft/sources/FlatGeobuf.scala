package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Wkb

/** FlatGeobuf source (SURVEY.md §2 A1 long tail: the sixth and last named
  * vector format — the cloud-optimized flatbuffers container). Pure-Scala
  * subset codec over the PUBLIC FlatGeobuf v3 spec (flatgeobuf.org,
  * `src/fbs/header.fbs` / `feature.fbs`): 8-byte magic
  * `fgb\x03fgb\x00`, a size-prefixed flatbuffers Header (name, geometry
  * type, column schema, feature count, index node size), then one
  * size-prefixed flatbuffers Feature per record (Geometry table with
  * `ends`/`xy` vectors + packed property bytes).
  *
  * The flatbuffers MECHANICS are implemented from the public format spec,
  * not a library: root u32 offset → table, table's leading i32 soffset →
  * vtable (position = table − soffset), vtable = u16 size + u16 table
  * size + per-field u16 offsets (0 = absent), scalars inline,
  * strings/vectors/tables as u32 forward offsets relative to the field
  * slot, vectors length-prefixed, scalars aligned (doubles 8, u32 4,
  * u16 2) — the writer pads accordingly so real readers seek cleanly.
  *
  * Index (r16): a non-zero `index_node_size` declares the packed Hilbert
  * R-tree section between header and features (the default-tooling wild
  * form — ogr2ogr writes it unless told not to). The writer emits it
  * (features Hilbert-sorted on the 16-bit quantized bbox-center grid,
  * 40-byte nodes: 4×f64 bbox + u64 offset, levels laid out root-first
  * with leaves last — the public flatbush-derived layout), the
  * sequential reader SKIPS it by computed byte length (node math needs
  * `features_count`, so an index without a count is refused loudly),
  * and [[readBbox]] USES it: a tree walk from the root touches only the
  * node runs whose boxes intersect the query window and decodes only the
  * features their leaf offsets point at — the FGB analog of
  * [[GeoParquet.readBbox]]'s footer pruning. Property columns support
  * the String / Long / Double / Bool column types; geometry supports
  * Point / LineString / Polygon (rings via `ends`) / MultiPoint and
  * MultiLineString, plus MultiPolygon through nested `parts`.
  *
  * Scale shape: like [[Shapefile]]/[[GeoPackage]], one task per file
  * (`binaryFile` scan — a cloud-optimized FGB lands as many per-region
  * files); all decoding executor-side.
  */
object FlatGeobuf {

  import Kml.{KGeom, KPoint, KLine, KPolygon, KMulti}

  private val Magic: Array[Byte] =
    Array(0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x00).map(_.toByte)

  // Column types from the public spec's ColumnType enum
  private val ColString = 11
  private val ColLong = 7
  private val ColDouble = 10
  private val ColBool = 2

  // GeometryType enum values (public spec)
  private val GPoint = 1
  private val GLine = 2
  private val GPolygon = 3
  private val GMultiPoint = 4
  private val GMultiLine = 5
  private val GMultiPolygon = 6

  // ------------------------------------------------------------ fb writer
  /** Forward-building flatbuffers emitter: parents first with placeholder
    * child offsets patched once the child position is known (children sit
    * at higher addresses, so every patched relative offset is positive —
    * the layout real builders produce, just computed eagerly).
    */
  private final class FbBuilder {
    private val out = new java.io.ByteArrayOutputStream()
    private var patches = List.empty[(Int, Int => Int)] // (at, pos => rel)

    def pos: Int = out.size
    def bytes(b: Array[Byte]): Unit = out.write(b)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = { var i = 0; while (i < 4) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    def i32(v: Int): Unit = u32(v.toLong & 0xffffffffL)
    def u64(v: Long): Unit = { var i = 0; while (i < 8) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    def f64(v: Double): Unit = u64(java.lang.Double.doubleToLongBits(v))
    def align(n: Int): Unit = while (pos % n != 0) out.write(0)

    /** Reserve a u32 offset slot at the current position; when `target`
      * is later resolved to an absolute position, rel = target − at.
      */
    def offsetSlot(): Int = { val at = pos; u32(0L); at }
    def patch(at: Int, target: Int): Unit = patches ::= (at, (_: Int) => target - at)

    def result(): Array[Byte] = {
      val arr = out.toByteArray
      patches.foreach { case (at, rel) =>
        val r = rel(at)
        var i = 0
        while (i < 4) { arr(at + i) = ((r >> (8 * i)) & 0xff).toByte; i += 1 }
      }
      arr
    }

    /** vtable + table skeleton: `fields` maps field id → (alignment,
      * inline size, write thunk OR offset-slot marker). Returns the table
      * position; offset-slot positions are returned for patching.
      */
    def table(fields: Seq[(Int, TableField)]): (Int, Map[Int, Int]) = {
      val maxId = if (fields.isEmpty) -1 else fields.map(_._1).max
      // assign inline offsets in id order, honoring each field's alignment
      var off = 4 // after the i32 vtable soffset
      val offsets = scala.collection.mutable.Map.empty[Int, Int]
      fields.sortBy(_._1).foreach { case (id, f) =>
        while (off % f.align != 0) off += 1
        offsets(id) = off
        off += f.size
      }
      val tableSize = off
      align(2)
      val vt = pos
      u16(4 + 2 * (maxId + 1))
      u16(tableSize)
      (0 to maxId).foreach(id => u16(offsets.getOrElse(id, 0)))
      // table: align to the widest inline scalar (8 covers all cases)
      align(8)
      // the soffset slot must land exactly at an offset where T - vt fits;
      // pad so every inline field lands aligned relative to buffer too
      val t = pos
      i32(t - vt)
      var written = 4
      val slots = scala.collection.mutable.Map.empty[Int, Int]
      fields.sortBy(_._1).foreach { case (id, f) =>
        while (written < offsets(id)) { out.write(0); written += 1 }
        f match {
          case InlineField(_, _, w) => w(this)
          case OffsetField => slots(id) = offsetSlot()
        }
        written += f.size
      }
      while (written < tableSize) { out.write(0); written += 1 }
      (t, slots.toMap)
    }

    def string(s: String): Int = {
      align(4)
      val p = pos
      val b = s.getBytes("UTF-8")
      u32(b.length.toLong)
      bytes(b); u8(0)
      p
    }

    def doubleVector(vs: Seq[Double]): Int = {
      align(8) // element alignment; length prefix sits in the pad gap
      // ensure the u32 length immediately precedes 8-aligned elements
      if (pos % 8 != 4) { var need = (4 + 8 - (pos % 8)) % 8; while (need > 0) { out.write(0); need -= 1 } }
      val p = pos
      u32(vs.length.toLong)
      vs.foreach(f64)
      p
    }

    def uintVector(vs: Seq[Long]): Int = {
      align(4)
      val p = pos
      u32(vs.length.toLong)
      vs.foreach(u32)
      p
    }

    def byteVector(b: Array[Byte]): Int = {
      align(4)
      val p = pos
      u32(b.length.toLong)
      bytes(b)
      p
    }

    def offsetVector(targets: Seq[Int]): Int = {
      align(4)
      val p = pos
      u32(targets.length.toLong)
      targets.foreach { t => val at = pos; u32(0L); patch(at, t) }
      p
    }
  }

  private sealed trait TableField { def align: Int; def size: Int }
  private final case class InlineField(align: Int, size: Int,
      write: FbBuilder => Unit) extends TableField
  private case object OffsetField extends TableField { val align = 4; val size = 4 }

  private def inU8(v: Int) = InlineField(1, 1, _.u8(v))
  private def inU16(v: Int) = InlineField(2, 2, _.u16(v))
  private def inU64(v: Long) = InlineField(8, 8, _.u64(v))

  // --------------------------------------------------------- write side
  private def geomType(g: KGeom): Int = g match {
    case _: KPoint => GPoint
    case _: KLine => GLine
    case _: KPolygon => GPolygon
    case KMulti(ms) if ms.nonEmpty && ms.forall(_.isInstanceOf[KPoint]) => GMultiPoint
    case KMulti(ms) if ms.nonEmpty && ms.forall(_.isInstanceOf[KLine]) => GMultiLine
    case KMulti(ms) if ms.nonEmpty && ms.forall(_.isInstanceOf[KPolygon]) => GMultiPolygon
    case _ => throw new IllegalArgumentException(
      "FlatGeobuf subset writer: empty or mixed MultiGeometry unsupported")
  }

  /** Geometry table; MultiPolygon nests per-polygon part tables. */
  private def writeGeometry(b: FbBuilder, g: KGeom,
      z: Seq[Double] = Nil): Int = {
    def flat(pts: Seq[(Double, Double)]): Seq[Double] =
      pts.flatMap { case (x, y) => Seq(x, y) }
    g match {
      case KMulti(ms) if geomType(g) == GMultiPolygon =>
        require(z.isEmpty,
          "FlatGeobuf writer: z on MultiPolygon parts not supported in this subset")
        val parts = ms.map(m => writeGeometry(b, m))
        val pv = b.offsetVector(parts)
        val (t, slots) = b.table(Seq(
          6 -> inU8(GMultiPolygon), 7 -> OffsetField))
        b.patch(slots(7), pv)
        t
      case _ =>
        val (ends, xy) = g match {
          case KPoint(x, y) => (Nil, Seq(x, y))
          case KLine(pts) => (Nil, flat(pts))
          case KPolygon(rings) =>
            // `ends` = cumulative vertex-end index per ring; single ring omits it
            val open = rings.map(r =>
              if (r.length > 1 && r.head == r.last) r else r :+ r.head)
            val cum = open.map(_.length).scanLeft(0L)(_ + _).tail
            (if (open.length > 1) cum else Nil, open.flatMap(flat))
          case KMulti(ms) => (Nil, ms.flatMap { case KPoint(x, y) => Seq(x, y)
            case other => throw new IllegalStateException(s"unexpected $other") })
        }
        require(z.isEmpty || z.length * 2 == xy.length,
          s"FlatGeobuf writer: ${z.length} z ordinates for ${xy.length / 2} vertices")
        val endsPos = if (ends.nonEmpty) Some(b.uintVector(ends)) else None
        val xyPos = b.doubleVector(xy)
        val zPos = if (z.nonEmpty) Some(b.doubleVector(z)) else None
        val fields = Seq.newBuilder[(Int, TableField)]
        endsPos.foreach(_ => fields += (0 -> OffsetField))
        fields += (1 -> OffsetField)
        zPos.foreach(_ => fields += (2 -> OffsetField))
        fields += (6 -> inU8(geomType(g)))
        val (t, slots) = b.table(fields.result())
        endsPos.foreach(p => b.patch(slots(0), p))
        b.patch(slots(1), xyPos)
        zPos.foreach(p => b.patch(slots(2), p))
        t
    }
  }

  // --------------------------------------------- packed Hilbert R-tree
  /** 40 bytes per node (public spec): 4×f64 bbox + u64 offset. */
  private val NodeBytes = 40

  /** Node counts per level, bottom-up ([numItems, ceil(n/ns), …, 1]). */
  private def levelNumNodes(numItems: Long, nodeSize: Int): Seq[Long] = {
    require(numItems > 0, "fgb index: no items")
    require(nodeSize >= 2, s"fgb index: node size $nodeSize < 2")
    val out = ArrayBuffer[Long](numItems)
    var n = numItems
    while (n != 1) { n = (n + nodeSize - 1) / nodeSize; out += n }
    out.toSeq
  }

  /** Total tree node count — gives the index section byte length the
    * sequential reader must SKIP (`× 40`).
    */
  def indexNodeCount(numItems: Long, nodeSize: Int): Long =
    levelNumNodes(numItems, nodeSize).sum

  /** (start, end) node-slot bounds per level, bottom-up: element 0 is the
    * leaf level occupying the LAST `numItems` slots; the root is slot 0 —
    * the public flatbush-derived layout FGB serializes.
    */
  private def levelBounds(numItems: Long, nodeSize: Int): Seq[(Long, Long)] = {
    val counts = levelNumNodes(numItems, nodeSize)
    var n = counts.sum
    counts.map { c => val b = (n - c, n); n -= c; b }
  }

  private def geomBbox(g: KGeom): (Double, Double, Double, Double) = {
    def ptsOf(g2: KGeom): Seq[(Double, Double)] = g2 match {
      case KPoint(x, y) => Seq((x, y))
      case KLine(pts) => pts
      case KPolygon(rings) => rings.flatten
      case KMulti(ms) => ms.flatMap(ptsOf)
    }
    val pts = ptsOf(g)
    require(pts.nonEmpty, "fgb index: empty geometry has no bbox")
    (pts.map(_._1).min, pts.map(_._2).min, pts.map(_._1).max, pts.map(_._2).max)
  }

  /** Order-16 Hilbert key of a bbox center quantized onto the layer
    * extent's 65536-cell grid — the sort the packed tree's balance (not
    * its correctness: parent boxes cover children in ANY order) rides.
    */
  private def hilbertOf(cx: Double, cy: Double,
      ext: (Double, Double, Double, Double)): Long = {
    def q(v: Double, lo: Double, hi: Double): Long =
      if (hi <= lo) 0L
      else math.min(65535L, math.max(0L, math.floor((v - lo) / (hi - lo) * 65536.0).toLong))
    org.apache.spark.sql.graftbridge.HilbertIndex.xy2d(
      q(cx, ext._1, ext._3), q(cy, ext._2, ext._4))
  }

  /** Serialize the packed tree: leaves (in feature order, offsets = the
    * feature's byte offset within the features section) fill the LAST
    * slots; each upper level unions runs of `nodeSize` children, its
    * nodes' offsets = the first child's node slot; root lands in slot 0.
    */
  private def buildIndex(boxes: Seq[(Double, Double, Double, Double)],
      offsets: Seq[Long], nodeSize: Int): Array[Byte] = {
    val numItems = boxes.length.toLong
    val bounds = levelBounds(numItems, nodeSize)
    val numNodes = bounds.head._2.toInt
    val nodes = new Array[(Double, Double, Double, Double, Long)](numNodes)
    val leafStart = bounds.head._1.toInt
    boxes.indices.foreach { i =>
      val b = boxes(i)
      nodes(leafStart + i) = (b._1, b._2, b._3, b._4, offsets(i))
    }
    var li = 0
    while (li < bounds.length - 1) {
      var pos = bounds(li)._1.toInt
      val end = bounds(li)._2.toInt
      var parent = bounds(li + 1)._1.toInt
      while (pos < end) {
        val first = pos
        var (mnx, mny, mxx, mxy) = (Double.PositiveInfinity, Double.PositiveInfinity,
          Double.NegativeInfinity, Double.NegativeInfinity)
        var j = 0
        while (j < nodeSize && pos < end) {
          val n = nodes(pos)
          if (n._1 < mnx) mnx = n._1
          if (n._2 < mny) mny = n._2
          if (n._3 > mxx) mxx = n._3
          if (n._4 > mxy) mxy = n._4
          pos += 1; j += 1
        }
        nodes(parent) = (mnx, mny, mxx, mxy, first.toLong)
        parent += 1
      }
      li += 1
    }
    val bb = ByteBuffer.allocate(numNodes * NodeBytes).order(ByteOrder.LITTLE_ENDIAN)
    nodes.foreach { n =>
      bb.putDouble(n._1); bb.putDouble(n._2); bb.putDouble(n._3); bb.putDouble(n._4)
      bb.putLong(n._5)
    }
    bb.array()
  }

  /** One feature's flatbuffer body (size prefix NOT included). */
  private def serializeFeature(props: Map[String, String], g: KGeom,
      colIndex: Map[String, Int], z: Seq[Double] = Nil): Array[Byte] = {
    val fb = new FbBuilder
    val fRootSlot = fb.offsetSlot()
    val gPos = writeGeometry(fb, g, z)
    val propBytes = {
      val po = new java.io.ByteArrayOutputStream()
      props.toSeq.sortBy(_._1).foreach { case (k, v) =>
        val idx = colIndex(k)
        po.write(idx & 0xff); po.write((idx >> 8) & 0xff)
        val vb = v.getBytes("UTF-8")
        writeU32(po, vb.length.toLong)
        po.write(vb)
      }
      po.toByteArray
    }
    val pPos = if (propBytes.nonEmpty) Some(fb.byteVector(propBytes)) else None
    val ffields = Seq.newBuilder[(Int, TableField)]
    ffields += (0 -> OffsetField)
    pPos.foreach(_ => ffields += (1 -> OffsetField))
    val (ft, fslots) = fb.table(ffields.result())
    fb.patch(fRootSlot, ft)
    fb.patch(fslots(0), gPos)
    pPos.foreach(p => fb.patch(fslots(1), p))
    fb.result()
  }

  /** One complete FGB file: string props become String columns (sorted
    * key order — the byte-deterministic [[Kml.placemarkXml]] rule).
    * `indexNodeSize > 0` writes the packed Hilbert R-tree section
    * (features re-ordered by the Hilbert key of their bbox center — the
    * layout that makes a bbox query touch few leaf runs).
    */
  def writeFgb(layer: String,
      features: Seq[(Map[String, String], KGeom)],
      indexNodeSize: Int = 0,
      zs: Seq[Seq[Double]] = Nil): Array[Byte] = {
    require(zs.isEmpty || zs.length == features.length,
      s"FlatGeobuf writer: ${zs.length} z rows for ${features.length} features")
    require(indexNodeSize == 0 || features.nonEmpty,
      "FlatGeobuf writer: cannot write an index for an empty layer")
    val colNames = features.flatMap(_._1.keys).distinct.sorted
    val colIndex = colNames.zipWithIndex.toMap
    // feature order: Hilbert-sorted when indexed (ties by input position
    // — fully deterministic), input order otherwise
    val order: Seq[Int] =
      if (indexNodeSize == 0) features.indices
      else {
        val boxes = features.map(f => geomBbox(f._2))
        val ext = (boxes.map(_._1).min, boxes.map(_._2).min,
          boxes.map(_._3).max, boxes.map(_._4).max)
        features.indices.sortBy { i =>
          val b = boxes(i)
          (hilbertOf((b._1 + b._3) / 2, (b._2 + b._4) / 2, ext), i.toLong)
        }
      }
    val featBlobs = order.map(i =>
      serializeFeature(features(i)._1, features(i)._2, colIndex,
        if (zs.isEmpty) Nil else zs(i)))
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)

    // ------- header flatbuffer
    val hb = new FbBuilder
    val rootSlot = hb.offsetSlot()
    val namePos = hb.string(layer)
    val colPos = colNames.map { cn =>
      val np = hb.string(cn)
      val (t, slots) = hb.table(Seq(0 -> OffsetField, 1 -> inU8(ColString)))
      hb.patch(slots(0), np)
      t
    }
    val colVec = if (colPos.nonEmpty) Some(hb.offsetVector(colPos)) else None
    val hfields = Seq.newBuilder[(Int, TableField)]
    hfields += (0 -> OffsetField)
    hfields += (2 -> inU8(0)) // geometry_type Unknown: per-feature types
    colVec.foreach(_ => hfields += (7 -> OffsetField))
    hfields += (8 -> inU64(features.length.toLong))
    hfields += (9 -> inU16(indexNodeSize)) // 0 = NO index section (subset)
    val (ht, hslots) = hb.table(hfields.result())
    hb.patch(rootSlot, ht)
    hb.patch(hslots(0), namePos)
    colVec.foreach(p => hb.patch(hslots(7), p))
    val headerBytes = hb.result()
    writeU32(out, headerBytes.length.toLong)
    out.write(headerBytes)

    // ------- index section (header and features bracket it, per spec)
    if (indexNodeSize > 0) {
      val boxes = order.map(i => geomBbox(features(i)._2))
      // leaf offsets = byte offset of each size-prefixed feature record
      // within the FEATURES section
      val offsets = featBlobs.scanLeft(0L)((acc, b) => acc + 4 + b.length).dropRight(1)
      out.write(buildIndex(boxes, offsets, indexNodeSize))
    }

    // ------- features
    featBlobs.foreach { featBytes =>
      writeU32(out, featBytes.length.toLong)
      out.write(featBytes)
    }
    out.toByteArray
  }

  private def writeU32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 4) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  // ---------------------------------------------------------- fb reader
  private final class Fb(buf: Array[Byte], base: Int) {
    private val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    def u8(p: Int): Int = bb.get(base + p) & 0xff
    def u16(p: Int): Int = bb.getShort(base + p) & 0xffff
    def i32(p: Int): Int = bb.getInt(base + p)
    def u32(p: Int): Long = bb.getInt(base + p).toLong & 0xffffffffL
    def u64(p: Int): Long = bb.getLong(base + p)
    def f64(p: Int): Double = bb.getDouble(base + p)
    def root: Int = u32(0).toInt

    /** Absolute-in-fb position of field `id`'s slot in the table at `t`,
      * or -1 when the field is absent.
      */
    def field(t: Int, id: Int): Int = {
      val vt = t - i32(t)
      val vtSize = u16(vt)
      val slot = 4 + 2 * id
      if (slot + 2 > vtSize) -1
      else {
        val off = u16(vt + slot)
        if (off == 0) -1 else t + off
      }
    }
    def indirect(p: Int): Int = p + u32(p).toInt
    def string(p: Int): String = {
      val s = indirect(p)
      val len = u32(s).toInt
      new String(buf, base + s + 4, len, "UTF-8")
    }
    def vecLen(v: Int): Int = u32(v).toInt
  }

  private def geomToWkb(fb: Fb, g: Int): Array[Byte] = {
    val tpe = fb.field(g, 6) match { case -1 => 0; case p => fb.u8(p) }
    def xySeq: Seq[(Double, Double)] = fb.field(g, 1) match {
      case -1 => Nil
      case p =>
        val v = fb.indirect(p)
        val n = fb.vecLen(v) / 2
        (0 until n).map(i => (fb.f64(v + 4 + 16 * i), fb.f64(v + 4 + 16 * i + 8)))
    }
    // the spec's per-vertex z vector (field 2): CARRIED into Z-typed WKB
    // when present, with a loud length check against the xy vector
    def zSeq: Seq[Double] = fb.field(g, 2) match {
      case -1 => Nil
      case p =>
        val v = fb.indirect(p)
        (0 until fb.vecLen(v)).map(i => fb.f64(v + 4 + 8 * i))
    }
    def rowsOf(pts: Seq[(Double, Double)]): (Seq[IndexedSeq[Double]], Boolean) = {
      val z = zSeq
      if (z.isEmpty) (pts.map(p => IndexedSeq(p._1, p._2)), false)
      else {
        require(z.length == pts.length,
          s"FlatGeobuf: z vector has ${z.length} ordinates for ${pts.length} vertices")
        (pts.zip(z).map { case ((x, y), zz) => IndexedSeq(x, y, zz) }, true)
      }
    }
    def ends: Seq[Int] = fb.field(g, 0) match {
      case -1 => Nil
      case p =>
        val v = fb.indirect(p)
        (0 until fb.vecLen(v)).map(i => fb.u32(v + 4 + 4 * i).toInt)
    }
    def rings(pts: Seq[(Double, Double)]): Seq[Seq[(Double, Double)]] = {
      val cuts = if (ends.nonEmpty) ends else Seq(pts.length)
      cuts.zip(0 +: cuts.dropRight(1)).map { case (e, s) => pts.slice(s, e) }
    }
    tpe match {
      case GPoint =>
        val (rows, z) = rowsOf(xySeq)
        Wkb.pointIso(rows.head, hasZ = z, hasM = false)
      case GLine =>
        val (rows, z) = rowsOf(xySeq)
        Wkb.lineStringIso(rows, hasZ = z, hasM = false)
      case GPolygon =>
        val (rows, z) = rowsOf(xySeq)
        val cuts = if (ends.nonEmpty) ends else Seq(rows.length)
        Wkb.polygonIso(
          cuts.zip(0 +: cuts.dropRight(1)).map { case (e, st) => rows.slice(st, e) },
          hasZ = z, hasM = false)
      case GMultiPoint =>
        val (rows, z) = rowsOf(xySeq)
        Wkb.multiIso(4, z, hasM = false, rows.map(Wkb.pointIso(_, z, hasM = false)))
      case GMultiLine =>
        val (rows, z) = rowsOf(xySeq)
        val cuts = if (ends.nonEmpty) ends else Seq(rows.length)
        Wkb.multiIso(5, z, hasM = false,
          cuts.zip(0 +: cuts.dropRight(1)).map { case (e, st) =>
            Wkb.lineStringIso(rows.slice(st, e), hasZ = z, hasM = false) })
      case GMultiPolygon =>
        val pv = fb.field(g, 7) match {
          case -1 => throw new IllegalArgumentException("MultiPolygon without parts")
          case p => fb.indirect(p)
        }
        val members = (0 until fb.vecLen(pv)).map { i =>
          val slot = pv + 4 + 4 * i
          geomToWkb(fb, fb.indirect(slot))
        }
        Wkb.multi(6, members)
      case other => throw new IllegalArgumentException(
        s"FlatGeobuf subset reader: geometry type $other unsupported")
    }
  }

  final case class FgbFeature(geomWkb: Array[Byte], props: Map[String, String])

  /** Parsed header: layer name, index node size (0 = no index section),
    * declared feature count, column schema, and the byte position right
    * after the header (where the index — or the first feature — starts).
    */
  private final case class FgbHeader(layer: String, nodeSize: Int,
      count: Long, cols: IndexedSeq[(String, Int)], bodyStart: Int)

  private def parseHeader(bytes: Array[Byte]): FgbHeader = {
    require(bytes.length > 12 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      "not a FlatGeobuf v3 file (magic mismatch)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var p = Magic.length
    val headerLen = bb.getInt(p) & 0xffffffff.toInt; p += 4
    val hfb = new Fb(bytes, p)
    val ht = hfb.root
    val layer = hfb.field(ht, 0) match { case -1 => ""; case f => hfb.string(f) }
    val count = hfb.field(ht, 8) match { case -1 => 0L; case f => hfb.u64(f) }
    val nodeSize = hfb.field(ht, 9) match { case -1 => 16; case f => hfb.u16(f) }
    val cols: IndexedSeq[(String, Int)] = hfb.field(ht, 7) match {
      case -1 => IndexedSeq.empty
      case f =>
        val v = hfb.indirect(f)
        (0 until hfb.vecLen(v)).map { i =>
          val ct = hfb.indirect(v + 4 + 4 * i)
          val nm = hfb.field(ct, 0) match { case -1 => s"col$i"; case nf => hfb.string(nf) }
          val tp = hfb.field(ct, 1) match { case -1 => ColString; case tf => hfb.u8(tf) }
          (nm, tp)
        }
    }
    FgbHeader(layer, nodeSize, count, cols, p + headerLen)
  }

  /** The index section's byte length for a parsed header — what a
    * sequential scan SKIPS. Sizing the tree needs the feature count, so
    * an indexed file that omits it is refused loudly (misparsing tree
    * nodes as features is the silent-wrong alternative).
    */
  private def indexByteLen(h: FgbHeader, fileLen: Int): Long =
    if (h.nodeSize == 0) 0L
    else if (h.count > 0) indexNodeCount(h.count, h.nodeSize) * NodeBytes
    else if (h.bodyStart >= fileLen) 0L // empty layer: no index, no features
    else throw new IllegalArgumentException(
      s"FlatGeobuf reader: index_node_size ${h.nodeSize} declares a packed " +
        "R-tree but the header carries no features_count — cannot size the " +
        "tree, refusing to misparse nodes as features")

  /** Decode the size-prefixed feature record at `pos`; returns the
    * feature and the total record length (4 + body).
    */
  private def decodeFeature(bytes: Array[Byte], pos: Int,
      cols: IndexedSeq[(String, Int)]): (FgbFeature, Int) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val fLen = bb.getInt(pos)
    val p = pos + 4
    val ffb = new Fb(bytes, p)
    val ft = ffb.root
    val wkb = ffb.field(ft, 0) match {
      case -1 => null
      case gf => geomToWkb(ffb, ffb.indirect(gf))
    }
    val props = ffb.field(ft, 1) match {
      case -1 => Map.empty[String, String]
      case pf =>
        val v = ffb.indirect(pf)
        val len = ffb.vecLen(v)
        val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
        var q = v + 4
        val end = v + 4 + len
        while (q < end) {
          val idx = ffb.u16(q); q += 2
          val (nm, tp) = if (idx < cols.length) cols(idx) else (s"col$idx", ColString)
          tp match {
            case ColString =>
              val l = ffb.u32(q).toInt; q += 4
              out(nm) = new String(bytes, p + q, l, "UTF-8"); q += l
            case ColLong => out(nm) = ffb.u64(q).toString; q += 8
            case ColDouble => out(nm) = ffb.f64(q).toString; q += 8
            case ColBool => out(nm) = (ffb.u8(q) != 0).toString; q += 1
            case other => throw new IllegalArgumentException(
              s"FlatGeobuf subset reader: column type $other unsupported")
          }
        }
        out.toMap
    }
    (FgbFeature(wkb, props), 4 + fLen)
  }

  /** Parse one complete .fgb byte array (an index section, if declared,
    * is skipped by computed length — default-tooling files scan).
    */
  def parse(bytes: Array[Byte]): (String, Seq[FgbFeature]) = {
    val h = parseHeader(bytes)
    var p = (h.bodyStart + indexByteLen(h, bytes.length)).toInt
    val feats = Seq.newBuilder[FgbFeature]
    while (p + 4 <= bytes.length) {
      val (f, len) = decodeFeature(bytes, p, h.cols)
      feats += f
      p += len
    }
    (h.layer, feats.result())
  }

  /** Bbox query THROUGH the packed Hilbert R-tree: walks node runs from
    * the root, descends only into children whose boxes intersect the
    * window, and decodes only the features the surviving leaf offsets
    * point at. Returns (declared feature count, matched features in
    * file order) — the count lets callers pin that pruning actually
    * skipped work. Refuses unindexed files loudly (a silent full scan
    * would misreport the pruning this API promises; use [[parse]]).
    */
  /** Tree walk over an in-memory buffer whose index section starts at
    * `indexStart`: surviving LEAF offsets (byte offsets into the features
    * section), unsorted. Shared by [[searchBbox]] (whole file in memory)
    * and [[readBboxRanged]] (index-only buffer, `indexStart = 0`).
    */
  private def walkIndex(bb: ByteBuffer, indexStart: Long, count: Long,
      nodeSize: Int, xmin: Double, ymin: Double, xmax: Double,
      ymax: Double): ArrayBuffer[Long] = {
    val bounds = levelBounds(count, nodeSize)
    val hits = ArrayBuffer.empty[Long]
    val queue = scala.collection.mutable.Queue[(Long, Int)]((0L, bounds.length - 1))
    while (queue.nonEmpty) {
      val (nodeIndex, level) = queue.dequeue()
      val isLeaf = level == 0
      val end = math.min(nodeIndex + nodeSize, bounds(level)._2)
      var pos = nodeIndex
      while (pos < end) {
        val base = (indexStart + pos * NodeBytes).toInt
        val nx0 = bb.getDouble(base); val ny0 = bb.getDouble(base + 8)
        val nx1 = bb.getDouble(base + 16); val ny1 = bb.getDouble(base + 24)
        val off = bb.getLong(base + 32)
        if (!(nx1 < xmin || nx0 > xmax || ny1 < ymin || ny0 > ymax)) {
          if (isLeaf) hits += off else queue.enqueue((off, level - 1))
        }
        pos += 1
      }
    }
    hits
  }

  def searchBbox(bytes: Array[Byte], xmin: Double, ymin: Double,
      xmax: Double, ymax: Double): (Long, Seq[FgbFeature]) = {
    val h = parseHeader(bytes)
    require(h.nodeSize > 0,
      "FlatGeobuf searchBbox: file declares no index (index_node_size 0) — " +
        "bbox pushdown needs the packed R-tree; use the full scan + filter")
    if (h.count == 0) return (0L, Seq.empty)
    val numNodes = levelBounds(h.count, h.nodeSize).head._2
    val featStart = h.bodyStart.toLong + numNodes * NodeBytes
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val hits = walkIndex(bb, h.bodyStart.toLong, h.count, h.nodeSize,
      xmin, ymin, xmax, ymax)
    (h.count, hits.sorted.toSeq
      .map(off => decodeFeature(bytes, (featStart + off).toInt, h.cols)._1))
  }

  /** One surviving feature's byte range inside a file, plus the column
    * schema its properties decode with.
    */
  private[sources] final case class FeatRange(path: String, start: Long, len: Int,
      colNames: Seq[String], colTypes: Seq[Int])

  /** Driver half of [[readBboxRanged]]: read ONLY magic + header + the
    * index section of one file (seek'd — never the features), walk the
    * tree, and return the surviving features' absolute byte ranges.
    * Record lengths come from the SORTED full leaf-offset set (the index
    * buffer already holds every leaf, so successor offsets are free; the
    * file's last record ends at EOF).
    */
  private def rangedIndex(fs: org.apache.hadoop.fs.FileSystem,
      file: org.apache.hadoop.fs.Path, fileLen: Long, xmin: Double,
      ymin: Double, xmax: Double, ymax: Double): Seq[FeatRange] = {
    val in = fs.open(file)
    try {
      val head = new Array[Byte](12)
      in.readFully(head)
      require(Magic.indices.forall(i => head(i) == Magic(i)),
        s"not a FlatGeobuf v3 file (magic mismatch): $file")
      val headerLen = ByteBuffer.wrap(head, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      val pre = new Array[Byte](12 + headerLen)
      System.arraycopy(head, 0, pre, 0, 12)
      in.readFully(pre, 12, headerLen)
      val h = parseHeader(pre)
      require(h.nodeSize > 0,
        s"FlatGeobuf readBboxRanged: $file declares no index — bbox " +
          "pushdown needs the packed R-tree; use the full scan + filter")
      if (h.count == 0) return Seq.empty
      val numNodes = levelBounds(h.count, h.nodeSize).head._2
      // past ~53M features the index exceeds 2 GB and the toInt below
      // would wrap (NegativeArraySizeException at best, a silent misread
      // at worst) — refuse with a named message instead
      require(numNodes * NodeBytes <= Int.MaxValue,
        s"FlatGeobuf readBboxRanged: $file index is ${numNodes * NodeBytes} " +
          "bytes (> 2 GB, ~53M features) — beyond one in-memory buffer; " +
          "split the file or use the full scan + filter")
      val indexBytes = new Array[Byte]((numNodes * NodeBytes).toInt)
      in.readFully(indexBytes)
      val featStart = 12L + headerLen + numNodes * NodeBytes
      val bb = ByteBuffer.wrap(indexBytes).order(ByteOrder.LITTLE_ENDIAN)
      val hits = walkIndex(bb, 0L, h.count, h.nodeSize, xmin, ymin, xmax, ymax)
      if (hits.isEmpty) return Seq.empty
      // every leaf offset is in the buffer: successor offset = record end
      val leafStart = (numNodes - h.count) * NodeBytes
      val allOffs = (0L until h.count)
        .map(i => bb.getLong((leafStart + i * NodeBytes + 32).toInt)).sorted
      val endOf = allOffs.zip(allOffs.drop(1) :+ (fileLen - featStart)).toMap
      val colNames = h.cols.map(_._1)
      val colTypes = h.cols.map(_._2)
      hits.sorted.map { off =>
        FeatRange(file.toString, featStart + off, (endOf(off) - off).toInt,
          colNames, colTypes)
      }.toSeq
    } finally in.close()
  }

  /** [[readBbox]]'s BYTE-RANGED twin — the object-store shape: the driver
    * reads only magic + header + index per file (the index is ~40 bytes
    * per feature, a few percent of the file; one sequential read beats
    * per-node-run seeks on remote storage), walks the tree, and ships one
    * row per surviving feature byte range; each task then range-reads
    * EXACTLY its features. Bytes moved ∝ matches + index size — never the
    * file (readBbox's binaryFile load pulls whole files into memory
    * before pruning decode work). Results identical to [[readBbox]]
    * (spec-pinned; the a1f3 gate hash-matches the same full-table
    * oracle). The driver Hadoop conf rides a broadcast into the
    * range-read tasks — the [[OsmPbf.readSplit]] credential rule.
    */
  def readBboxRanged(spark: SparkSession, pathGlob: String, layer: String,
      idField: String, xmin: Double, ymin: Double, xmax: Double, ymax: Double,
      eventTsUs: Long = 0L): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val glob = new org.apache.hadoop.fs.Path(pathGlob)
    val statuses = glob.getFileSystem(conf).globStatus(glob)
    require(statuses != null && statuses.nonEmpty, s"fgb: no files match $pathGlob")
    val ranges = statuses.toSeq.flatMap { st =>
      rangedIndex(st.getPath.getFileSystem(conf), st.getPath, st.getLen,
        xmin, ymin, xmax, ymax)
    }
    val box = org.apache.spark.sql.graftbridge.HadoopConfBridge
      .broadcast(spark.sparkContext)
    val n = math.min(math.max(1, ranges.length),
      math.max(1, spark.sparkContext.defaultParallelism))
    spark.createDataset(ranges).repartition(n).map { r =>
      val p = new org.apache.hadoop.fs.Path(r.path)
      val in = p.getFileSystem(box.conf).open(p)
      try {
        in.seek(r.start)
        val rec = new Array[Byte](r.len)
        in.readFully(rec)
        val f = decodeFeature(rec, 0, r.colNames.zip(r.colTypes).toIndexedSeq)._1
        (layer, f.props.getOrElse(idField, null), f.geomWkb, f.props, r.path)
      } finally in.close()
    }.toDF("layer", "feature_id", "geom_wkb", "props", "source")
      .select($"layer", $"feature_id", $"geom_wkb", $"props",
        timestamp_micros(lit(eventTsUs)).as("event_ts"), $"source",
        lit(1).as("fmt_version"))
      .select("layer", "feature_id", "geom_wkb", "props", "event_ts", "source", "fmt_version")
  }

  /** .fgb files → the canonical feature envelope ([[Kml.read]] columns;
    * the feature id comes from a property, FGB having no id slot).
    */
  def read(spark: SparkSession, pathGlob: String, layer: String,
      idField: String, eventTsUs: Long = 0L): DataFrame = {
    import spark.implicits._
    val rows = spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content").as[(String, Array[Byte])]
    rows.flatMap { case (path, bytes) =>
      parse(bytes)._2.map { f =>
        (layer, f.props.getOrElse(idField, null), f.geomWkb, f.props, path)
      }
    }.toDF("layer", "feature_id", "geom_wkb", "props", "source")
      .select($"layer", $"feature_id", $"geom_wkb", $"props",
        timestamp_micros(lit(eventTsUs)).as("event_ts"), $"source",
        lit(1).as("fmt_version"))
      .select("layer", "feature_id", "geom_wkb", "props", "event_ts", "source", "fmt_version")
  }

  /** [[read]]'s index-pruned twin (the [[GeoParquet.readBbox]] analog for
    * FGB): per file, only tree-surviving features are decoded — the
    * per-file R-tree walk runs inside the task, so a many-file layer
    * prunes in parallel with zero driver work. Callers re-apply the
    * EXACT row predicate on top (the tree prunes at bbox granularity);
    * the a1f2 gate hash-matches a full-table oracle to prove pruning
    * lost nothing.
    */
  def readBbox(spark: SparkSession, pathGlob: String, layer: String,
      idField: String, xmin: Double, ymin: Double, xmax: Double, ymax: Double,
      eventTsUs: Long = 0L): DataFrame = {
    import spark.implicits._
    val rows = spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content").as[(String, Array[Byte])]
    rows.flatMap { case (path, bytes) =>
      searchBbox(bytes, xmin, ymin, xmax, ymax)._2.map { f =>
        (layer, f.props.getOrElse(idField, null), f.geomWkb, f.props, path)
      }
    }.toDF("layer", "feature_id", "geom_wkb", "props", "source")
      .select($"layer", $"feature_id", $"geom_wkb", $"props",
        timestamp_micros(lit(eventTsUs)).as("event_ts"), $"source",
        lit(1).as("fmt_version"))
      .select("layer", "feature_id", "geom_wkb", "props", "event_ts", "source", "fmt_version")
  }
}

package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Wkb

/** Pure-Scala GeoPackage source (SURVEY.md §2 A1: the reference's
  * producer reads vector files via OGR — Shapefile/GeoJSON/GPKG
  * [UPSTREAM-UNVERIFIED]; a GPKG is a SQLite database with OGC-specified
  * metadata tables, both formats public: sqlite.org/fileformat2 and the
  * OGC GeoPackage encoding standard).
  *
  * Scope — a deliberately minimal READ-ONLY subset, loud on everything
  * else: table b-trees (leaf + interior, arbitrary depth), the record
  * serial-type codes, overflow-page chains, `sqlite_master` discovery,
  * column names from a minimal CREATE TABLE parse, and the GPKG geometry
  * blob (header + envelope skip + SRID → EWKB via [[Wkb.setSrid]]).
  * NOT parsed: indexes, WITHOUT ROWID tables, freelists, WAL — a file
  * needing them for correct reads fails loudly, never misreads.
  * `INTEGER PRIMARY KEY` columns are rowid aliases (stored as NULL in
  * the record); the reader substitutes the rowid, per the SQLite spec.
  *
  * Scale shape: like [[Shapefile]], one task per file (`binaryFile`
  * scan) — a SQLite file is a page-pointer graph, not a splittable
  * stream; this is the ingest-edge/interop path and bulk re-lands into
  * splittable forms after one pass. The GeoPackageSpec fixture is
  * genuine SQLite output (python sqlite3), not this repo's own writer —
  * the parse is tested against real-world bytes including a multi-page
  * b-tree and an overflow chain.
  */
object GeoPackage {

  // ----------------------------------------------------------- writing
  // Fixture-writer half (the Shapefile pattern): emits a format-valid
  // minimal GeoPackage — sqlite_master + gpkg_contents +
  // gpkg_geometry_columns + ONE feature table (fid INTEGER PRIMARY KEY,
  // etype TEXT, geom BLOB) — so the a1c oracle row can hash-check the
  // READ path against engine-written bytes. 64 KiB pages keep the
  // feature b-tree two-level up to ~1M rows; rows beyond the local
  // payload max spill to spec-conformant overflow chains (roundtrip
  // property-tested in GpkgCodecSpec).

  private val WPageSize = 65536
  /** Max entries per rtree node — SQLite's module packs ~51 at its
    * default page size; matching it keeps depths realistic for readers.
    */
  private val RtreeNodeCap = 51

  private[sources] def wVarint(v: Long): Array[Byte] = {
    require(v >= 0, "writer varints are nonnegative here")
    if (v < 128) Array(v.toByte)
    else if (v < (1L << 56)) {
      val groups = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var x = v
      while (x > 0) { groups.prepend((x & 0x7F).toByte); x >>= 7 }
      (0 until groups.length - 1).foreach(i => groups(i) = (groups(i) | 0x80).toByte)
      groups.toArray
    } else {
      // 9-byte form (SQLite fileformat2): the NINTH byte carries the low
      // EIGHT bits verbatim; the first eight bytes carry bits 62..8 as
      // 7-bit groups, all with the continuation bit set
      val out = new Array[Byte](9)
      out(8) = (v & 0xFF).toByte
      var x = v >>> 8
      (7 to 0 by -1).foreach { i => out(i) = ((x & 0x7F) | 0x80).toByte; x >>>= 7 }
      out
    }
  }

  /** SQLite record from values (null / Long / Double / String / bytes). */
  private[sources] def wRecord(vals: Seq[Any]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    val types = vals.map {
      case null => 0L
      case v: Long =>
        val b = ByteBuffer.allocate(8).putLong(v).array()
        body.write(b); 6L
      case d: Double =>
        body.write(ByteBuffer.allocate(8).putLong(
          java.lang.Double.doubleToLongBits(d)).array()); 7L
      case s: String =>
        val b = s.getBytes("UTF-8"); body.write(b); 13L + 2 * b.length
      case b: Array[Byte] => body.write(b); 12L + 2 * b.length
      case other => throw new IllegalArgumentException(s"gpkg writer: $other")
    }
    val typeBytes = types.flatMap(wVarint).toArray
    // header length varint counts itself — 1 byte suffices for our rows
    val hdrLen = 1 + typeBytes.length
    require(hdrLen < 128, "gpkg writer: record header too wide")
    val out = new java.io.ByteArrayOutputStream()
    out.write(hdrLen)
    out.write(typeBytes)
    body.writeTo(out)
    out.toByteArray
  }

  /** Build a table b-tree from (rowid, record) rows onto `pages`
    * (1-based growth list); returns the root page number. Records larger
    * than the leaf's local-payload max spill to overflow pages per the
    * spec's K/X split (the same arithmetic [[tableRows]] reads back):
    * local = K = minLocal + ((P − minLocal) mod (U − 4)) if K ≤ X else
    * minLocal, remainder in a chain of (4-byte next-pointer + U−4
    * payload bytes) pages. Overflow pages are appended as each cell is
    * built — page order is free in SQLite (pointers are explicit), so
    * chains interleaving ahead of their leaf is format-valid.
    */
  private def wTable(pages: scala.collection.mutable.ArrayBuffer[Array[Byte]],
      rows: Seq[(Long, Array[Byte])]): Int = {
    val maxLocal = WPageSize - 35
    val minLocal = (WPageSize - 12) * 32 / 255 - 23
    val cells = rows.map { case (rid, rec) =>
      if (rec.length <= maxLocal)
        (rid, wVarint(rec.length.toLong) ++ wVarint(rid) ++ rec)
      else {
        val k = minLocal + ((rec.length - minLocal) % (WPageSize - 4))
        val local = if (k <= maxLocal) k else minLocal
        val firstOverflow = pages.length + 1
        var off = local
        while (off < rec.length) {
          val take = math.min(WPageSize - 4, rec.length - off)
          val page = new Array[Byte](WPageSize)
          val next = if (off + take < rec.length) pages.length + 2 else 0
          putU32(page, 0, next.toLong)
          System.arraycopy(rec, off, page, 4, take)
          pages += page
          off += take
        }
        (rid, wVarint(rec.length.toLong) ++ wVarint(rid) ++ rec.take(local) ++
          ByteBuffer.allocate(4).putInt(firstOverflow).array())
      }
    }
    // greedy leaf fill: 8-byte header + 2-byte pointer per cell
    val leaves = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)] // (maxRowid, page#)
    var i = 0
    while (i < cells.length || leaves.isEmpty) {
      val start = i
      var used = 8
      while (i < cells.length && used + 2 + cells(i)._2.length <= WPageSize) {
        used += 2 + cells(i)._2.length
        i += 1
      }
      val group = cells.slice(start, i)
      val page = new Array[Byte](WPageSize)
      page(0) = 0x0D
      putU16(page, 3, group.length)
      var content = WPageSize
      group.zipWithIndex.foreach { case ((_, cell), ci) =>
        content -= cell.length
        System.arraycopy(cell, 0, page, content, cell.length)
        putU16(page, 8 + 2 * ci, content)
      }
      putU16(page, 5, content)
      pages += page
      leaves += ((group.lastOption.map(_._1).getOrElse(0L), pages.length))
      if (cells.isEmpty) return pages.length // empty table: one empty leaf
    }
    if (leaves.length == 1) leaves.head._2
    else {
      // one interior root: cells (child, maxRowidOfChild) for all but last
      val page = new Array[Byte](WPageSize)
      page(0) = 0x05
      putU16(page, 3, leaves.length - 1)
      var content = WPageSize
      leaves.init.zipWithIndex.foreach { case ((maxRid, child), ci) =>
        val cell = ByteBuffer.allocate(4).putInt(child).array() ++ wVarint(maxRid)
        content -= cell.length
        System.arraycopy(cell, 0, page, content, cell.length)
        putU16(page, 12 + 2 * ci, content)
      }
      putU16(page, 5, content)
      putU32(page, 8, leaves.last._2)
      require(content >= 12 + 2 * (leaves.length - 1), "gpkg writer: b-tree needs 3 levels")
      pages += page
      pages.length
    }
  }

  private def putU16(b: Array[Byte], p: Int, v: Int): Unit = {
    b(p) = (v >> 8).toByte; b(p + 1) = v.toByte
  }
  private def putU32(b: Array[Byte], p: Int, v: Long): Unit = {
    b(p) = (v >> 24).toByte; b(p + 1) = (v >> 16).toByte
    b(p + 2) = (v >> 8).toByte; b(p + 3) = v.toByte
  }

  /** GPKG point blob (header + xy envelope + little-endian WKB). */
  def pointBlob(x: Double, y: Double, srid: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + 32 + 21).order(ByteOrder.LITTLE_ENDIAN)
    b.put('G'.toByte).put('P'.toByte).put(0.toByte).put(0x03.toByte)
    b.putInt(srid)
    b.putDouble(x).putDouble(x).putDouble(y).putDouble(y)
    b.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    b.array()
  }

  /** Write a minimal single-feature-table GeoPackage: rows are
    * (fid, etype, geometryBlob-or-null). Deterministic bytes (no
    * timestamps, fixed page size), readable by [[read]]; format-valid
    * per the SQLite/GPKG specs but NOT byte-identical to sqlite3 output
    * (no freelist, no integral-REAL squeeze — readers don't care).
    */
  def writeGpkg(table: String, srid: Int,
      rows: Seq[(Long, String, Array[Byte])], rtree: Boolean = false): Array[Byte] = {
    val pages = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    pages += new Array[Byte](WPageSize) // page 1 placeholder (master root)
    val contentsRoot = wTable(pages, Seq((1L, wRecord(Seq(
      table, "features", table, "", null, null, null, null, null, srid.toLong)))))
    val geomColsRoot = wTable(pages, Seq((1L, wRecord(Seq(
      table, "geom", "POINT", srid.toLong, 0L, 0L)))))
    val featureRoot = wTable(pages,
      rows.map { case (fid, etype, blob) =>
        (fid, wRecord(Seq(null, etype, blob))) // fid: rowid-alias NULL
      })
    // GPKG rtree extension (`gpkg_rtree_index`) — the form GDAL writes by
    // default: a gpkg_extensions registration, the VIRTUAL table's
    // sqlite_master entry (rootpage 0, the SQLite convention for virtual
    // tables), and the rtree module's three REAL shadow tables. Node
    // blobs use the module's storage format (2-byte depth on the root,
    // 2-byte cell count, cells of i64 rowid-or-child-nodeno + 4
    // big-endian f32 minx/maxx/miny/maxy), packed multi-level at
    // RtreeNodeCap entries/node with the bboxes lifted from each
    // feature's GPKG blob envelope — parseable ([[rtreeRowids]]) at any
    // depth, not decorative.
    val extras: Seq[(String, Int, String)] =
      if (!rtree) Seq.empty
      else {
        val extRoot = wTable(pages, Seq((1L, wRecord(Seq(
          table, "geom", "gpkg_rtree_index",
          "http://www.geopackage.org/spec120/#extension_rtree", "write-only")))))
        val cells = rows.collect { case (fid, _, blob) if blob != null =>
          // GPKG blob: magic(2) ver(1) flags(1) srid(4), envelope 4×f64
          // in minx, maxx, miny, maxy order — but ONLY when the flags
          // byte says so: the fixed offsets below assume envelope
          // indicator 1 and little-endian header. Caller-supplied blobs
          // can carry code 0 (no envelope) or a big-endian header, and
          // lifting f64s from those offsets would emit garbage bboxes
          // that silently drop true rtree candidates — refuse loudly.
          val flags = blob(3) & 0xFF
          require((flags & 1) == 1 && ((flags >> 1) & 0x7) == 1,
            s"gpkg rtree writer: feature $fid blob flags 0x${flags.toHexString} " +
              "— need little-endian header (flags bit 0) with envelope " +
              "indicator 1 (XY, flags bits 1-3); cannot lift a bbox")
          val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
          // DIRECTIONAL f64→f32: SQLite's module rounds mins down and
          // maxes up (rtreeValueDown/Up) so every f32 cell is a SUPERSET
          // of the true envelope — plain .toFloat rounds to nearest and
          // can SHRINK the box, silently dropping true window matches
          // at the pruned read
          def down(d: Double): Float = {
            val f = d.toFloat
            if (f.toDouble > d) Math.nextDown(f) else f
          }
          def up(d: Double): Float = {
            val f = d.toFloat
            if (f.toDouble < d) Math.nextUp(f) else f
          }
          (fid, down(bb.getDouble(8)), up(bb.getDouble(16)),
            down(bb.getDouble(24)), up(bb.getDouble(32)))
        }
        // multi-level packed tree (GDAL-scale layers have depth >= 1 —
        // SQLite's module packs ~51 entries/node): leaves hold (rowid,
        // bbox) runs of <= RtreeNodeCap in input order; interior cells
        // hold (child nodeno, f32 union bbox); node 1 is the root, the
        // rest numbered breadth-first — the module's storage layout,
        // parseable back by [[rtreeRowids]] at any depth.
        sealed trait RN
        final case class RLeaf(es: Seq[(Long, Float, Float, Float, Float)]) extends RN
        final case class RInner(ch: Seq[RN]) extends RN
        def bboxOf(n: RN): (Float, Float, Float, Float) = n match {
          case RLeaf(es) =>
            (es.map(_._2).min, es.map(_._3).max, es.map(_._4).min, es.map(_._5).max)
          case RInner(ch) =>
            val bs = ch.map(bboxOf)
            (bs.map(_._1).min, bs.map(_._2).max, bs.map(_._3).min, bs.map(_._4).max)
        }
        var level: Vector[RN] =
          if (cells.isEmpty) Vector(RLeaf(Seq.empty))
          else cells.grouped(RtreeNodeCap).map(RLeaf(_)).toVector
        var depth = 0
        while (level.length > 1) {
          level = level.grouped(RtreeNodeCap).map(g => RInner(g): RN).toVector
          depth += 1
        }
        // breadth-first numbering from the root = nodeno 1
        val numbered = scala.collection.mutable.ArrayBuffer.empty[(Long, RN, Long)] // (no, node, parent)
        val queue = scala.collection.mutable.Queue[(RN, Long)]((level.head, 0L))
        while (queue.nonEmpty) {
          val (n, parent) = queue.dequeue()
          val no = numbered.length + 1L
          numbered += ((no, n, parent))
          n match {
            case RInner(ch) => ch.foreach(c => queue.enqueue((c, no)))
            case _ =>
          }
        }
        // identity-keyed (two leaves can hold equal entry seqs — value
        // equality would alias them to one nodeno)
        val childNos = new java.util.IdentityHashMap[RN, java.lang.Long]()
        numbered.foreach { case (no, n, _) => childNos.put(n, no) }
        val nodeRows = numbered.map { case (no, n, _) =>
          val es: Seq[(Long, Float, Float, Float, Float)] = n match {
            case RLeaf(e) => e
            case RInner(ch) => ch.map { c =>
              val (a, b2, c2, d2) = bboxOf(c); (childNos.get(c).longValue, a, b2, c2, d2)
            }
          }
          val nb = ByteBuffer.allocate(4 + es.length * 24) // big-endian
          nb.putShort(if (no == 1L) depth.toShort else 0.toShort)
          nb.putShort(es.length.toShort)
          es.foreach { c =>
            nb.putLong(c._1)
            nb.putFloat(c._2); nb.putFloat(c._3); nb.putFloat(c._4); nb.putFloat(c._5)
          }
          (no, wRecord(Seq(null, nb.array())))
        }
        val leafNoOf: Map[Long, Long] = numbered.collect {
          case (no, RLeaf(es), _) => es.map(e => e._1 -> no)
        }.flatten.toMap
        val nodeRoot = wTable(pages, nodeRows.toSeq)
        val rowidRoot = wTable(pages,
          cells.map(c => (c._1, wRecord(Seq(null, leafNoOf(c._1))))))
        val parentRoot = wTable(pages, numbered.collect {
          case (no, _, parent) if parent > 0 => (no, wRecord(Seq(null, parent)))
        }.toSeq)
        val rt = s"rtree_${table}_geom"
        Seq(
          ("gpkg_extensions", extRoot,
            "CREATE TABLE gpkg_extensions (table_name TEXT, column_name TEXT, " +
              "extension_name TEXT, definition TEXT, scope TEXT)"),
          (rt, 0,
            s"CREATE VIRTUAL TABLE $rt USING rtree(id, minx, maxx, miny, maxy)"),
          (s"${rt}_node", nodeRoot,
            s"""CREATE TABLE "${rt}_node" (nodeno INTEGER PRIMARY KEY, data BLOB)"""),
          (s"${rt}_rowid", rowidRoot,
            s"""CREATE TABLE "${rt}_rowid" (rowid INTEGER PRIMARY KEY, nodeno INTEGER)"""),
          (s"${rt}_parent", parentRoot,
            s"""CREATE TABLE "${rt}_parent" (nodeno INTEGER PRIMARY KEY, parentnode INTEGER)"""))
      }
    val masterRows = (Seq(
      ("gpkg_contents", contentsRoot,
        "CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY, data_type TEXT, " +
          "identifier TEXT, description TEXT, last_change DATETIME, min_x DOUBLE, " +
          "min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"),
      ("gpkg_geometry_columns", geomColsRoot,
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT, " +
          "geometry_type_name TEXT, srs_id INTEGER, z TINYINT, m TINYINT)"),
      (table, featureRoot,
        s"CREATE TABLE $table (fid INTEGER PRIMARY KEY, etype TEXT, geom BLOB)")) ++ extras)
      .zipWithIndex.map { case ((name, root, sql), i) =>
        ((i + 1).toLong, wRecord(Seq("table", name, name, root.toLong, sql)))
      }
    // master fits page 1's leaf (3 small rows)
    val master = new Array[Byte](WPageSize)
    val hdr = 100
    master(hdr) = 0x0D
    putU16(master, hdr + 3, masterRows.length)
    var content = WPageSize
    masterRows.zipWithIndex.foreach { case ((rid, rec), ci) =>
      val cell = wVarint(rec.length.toLong) ++ wVarint(rid) ++ rec
      content -= cell.length
      System.arraycopy(cell, 0, master, content, cell.length)
      putU16(master, hdr + 8 + 2 * ci, content)
    }
    putU16(master, hdr + 5, content)
    // 100-byte db header
    val magic = "SQLite format 3\u0000".getBytes("ISO-8859-1")
    System.arraycopy(magic, 0, master, 0, 16)
    putU16(master, 16, 1) // page size 65536 encodes as 1
    master(18) = 1; master(19) = 1 // file format read/write version: legacy
    master(21) = 64; master(22) = 32; master(23) = 32 // payload fractions (fixed by spec)
    putU32(master, 28, pages.length.toLong) // page count
    putU32(master, 56, 1L) // text encoding: UTF-8
    putU32(master, 68, 1196444487L) // application_id 'GPKG'
    pages(0) = master
    val out = new java.io.ByteArrayOutputStream(pages.length * WPageSize)
    pages.foreach(out.write)
    out.toByteArray
  }

  // ------------------------------------------------------- sqlite pages

  private final case class Db(bytes: Array[Byte], pageSize: Int, usable: Int)

  private def open(bytes: Array[Byte]): Db = {
    require(bytes.length >= 100 &&
      new String(bytes, 0, 16, "ISO-8859-1") == "SQLite format 3\u0000",
      "gpkg: not a SQLite 3 file")
    val raw = ((bytes(16) & 0xFF) << 8) | (bytes(17) & 0xFF)
    val pageSize = if (raw == 1) 65536 else raw
    val reserved = bytes(20) & 0xFF
    Db(bytes, pageSize, pageSize - reserved)
  }

  /** SQLite varint: 1–9 bytes, big-endian 7-bit groups; 9th byte is all
    * 8 bits. Returns (value, bytesRead).
    */
  private[sources] def varint(b: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(pos + i)
      if ((x & 0x80) == 0) return (v << 7 | x, i + 1)
      v = v << 7 | (x & 0x7F)
      i += 1
    }
    (v << 8 | (b(pos + 8) & 0xFF), 9)
  }

  private def u16(b: Array[Byte], p: Int): Int = ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)
  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) | ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)

  /** Collect a full cell payload, following the overflow chain if the
    * local part is truncated (the spec's table-leaf K/X split).
    */
  private def payload(db: Db, page: Int, local: Array[Byte], total: Long,
      overflowPtr: Long): Array[Byte] = {
    if (local.length.toLong == total) return local
    val out = new java.io.ByteArrayOutputStream(total.toInt)
    out.write(local)
    var next = overflowPtr
    while (next != 0 && out.size() < total) {
      val off = (next - 1) * db.pageSize
      val take = math.min(db.usable - 4, total.toInt - out.size())
      out.write(db.bytes, off.toInt + 4, take)
      next = u32(db.bytes, off.toInt)
    }
    require(out.size().toLong == total, s"gpkg: truncated overflow chain on page $page")
    out.toByteArray
  }

  /** Walk a table b-tree depth-first, emitting (rowid, record payload). */
  /** Decode one LEAF table-b-tree cell at absolute offset `cell`:
    * (rowid, full payload) with the sqlite fileformat2 §B-tree local/
    * overflow split — the one subtle piece of arithmetic both b-tree
    * walkers must agree on, so it lives exactly once.
    */
  private def leafCell(db: Db, pageNo: Int, cell: Int): (Long, Array[Byte]) = {
    val (total, n1) = varint(db.bytes, cell)
    val (rowid, n2) = varint(db.bytes, cell + n1)
    val maxLocal = db.usable - 35
    val minLocal = (db.usable - 12) * 32 / 255 - 23
    val local =
      if (total <= maxLocal) total.toInt
      else {
        val k = minLocal + ((total - minLocal) % (db.usable - 4)).toInt
        if (k <= maxLocal) k else minLocal
      }
    val localBytes = java.util.Arrays.copyOfRange(db.bytes,
      cell + n1 + n2, cell + n1 + n2 + local)
    val over = if (total <= maxLocal) 0L else u32(db.bytes, cell + n1 + n2 + local)
    (rowid, payload(db, pageNo, localBytes, total, over))
  }

  private def tableRows(db: Db, rootPage: Int): Seq[(Long, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    def walk(pageNo: Int): Unit = {
      val base = (pageNo - 1).toLong * db.pageSize
      val hdr = (if (pageNo == 1) base + 100 else base).toInt
      val tpe = db.bytes(hdr) & 0xFF
      val nCells = u16(db.bytes, hdr + 3)
      tpe match {
        case 0x05 => // interior table page
          val ptrs = hdr + 12
          (0 until nCells).foreach { i =>
            val cell = base.toInt + u16(db.bytes, ptrs + 2 * i)
            walk(u32(db.bytes, cell).toInt)
          }
          walk(u32(db.bytes, hdr + 8).toInt) // rightmost child
        case 0x0D => // leaf table page
          val ptrs = hdr + 8
          (0 until nCells).foreach { i =>
            out += leafCell(db, pageNo, base.toInt + u16(db.bytes, ptrs + 2 * i))
          }
        case other =>
          throw new IllegalArgumentException(
            s"gpkg: page $pageNo has unsupported b-tree type 0x${other.toHexString} " +
              "(index or corrupt — this reader handles table b-trees only)")
      }
    }
    walk(rootPage)
    out.toSeq
  }

  /** Selective b-tree fetch: only rows whose rowid is in `wanted`
    * (sorted ascending), descending interior pages by their (child,
    * maxRowid) keys so subtrees with no wanted rowid are SKIPPED — the
    * point-lookup shape rtree candidates need (pages off the path are
    * never touched; on a leaf, non-wanted cells cost two varints, no
    * payload copy).
    */
  private def tableRowsSelect(db: Db, rootPage: Int,
      wanted: Array[Long]): Seq[(Long, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    if (wanted.isEmpty) return out.toSeq
    // any wanted rowid in [lo, hi]?
    def anyIn(lo: Long, hi: Long): Boolean = {
      val i = java.util.Arrays.binarySearch(wanted, lo)
      val idx = if (i >= 0) i else -i - 1
      idx < wanted.length && wanted(idx) <= hi
    }
    def walk(pageNo: Int, lo: Long, hi: Long): Unit = {
      if (!anyIn(lo, hi)) return
      val base = (pageNo - 1).toLong * db.pageSize
      val hdr = (if (pageNo == 1) base + 100 else base).toInt
      val tpe = db.bytes(hdr) & 0xFF
      val nCells = u16(db.bytes, hdr + 3)
      tpe match {
        case 0x05 =>
          val ptrs = hdr + 12
          var prev = lo
          (0 until nCells).foreach { i =>
            val cell = base.toInt + u16(db.bytes, ptrs + 2 * i)
            val child = u32(db.bytes, cell).toInt
            val (key, _) = varint(db.bytes, cell + 4)
            walk(child, prev, key)
            prev = key + 1
          }
          walk(u32(db.bytes, hdr + 8).toInt, prev, hi)
        case 0x0D =>
          val ptrs = hdr + 8
          (0 until nCells).foreach { i =>
            val cell = base.toInt + u16(db.bytes, ptrs + 2 * i)
            // peek the rowid (two varints) before paying the payload copy
            val (_, n1) = varint(db.bytes, cell)
            val (rowid, _) = varint(db.bytes, cell + n1)
            if (java.util.Arrays.binarySearch(wanted, rowid) >= 0)
              out += leafCell(db, pageNo, cell)
          }
        case other =>
          throw new IllegalArgumentException(
            s"gpkg: page $pageNo has unsupported b-tree type 0x${other.toHexString} " +
              "(index or corrupt — this reader handles table b-trees only)")
      }
    }
    walk(rootPage, Long.MinValue, Long.MaxValue)
    out.toSeq
  }

  /** Decode one record (header of serial types + body) to values:
    * null / Long / Double / String / Array[Byte].
    */
  private[sources] def record(p: Array[Byte]): Seq[Any] = {
    val (hdrLen, n0) = varint(p, 0)
    var hp = n0
    val types = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (hp < hdrLen) {
      val (t, n) = varint(p, hp)
      types += t
      hp += n
    }
    var bp = hdrLen.toInt
    types.toSeq.map { t =>
      def int(bytes: Int): Long = {
        var v = if ((p(bp) & 0x80) != 0) -1L else 0L // sign-extend
        (0 until bytes).foreach { i => v = (v << 8) | (p(bp + i) & 0xFFL) }
        bp += bytes
        v
      }
      t match {
        case 0 => null
        case 1 => int(1)
        case 2 => int(2)
        case 3 => int(3)
        case 4 => int(4)
        case 5 => int(6)
        case 6 => int(8)
        case 7 =>
          val v = java.lang.Double.longBitsToDouble(int(8)); v
        case 8 => 0L
        case 9 => 1L
        case n if n >= 12 && n % 2 == 0 =>
          val len = ((n - 12) / 2).toInt
          val v = java.util.Arrays.copyOfRange(p, bp, bp + len); bp += len; v
        case n if n >= 13 =>
          val len = ((n - 13) / 2).toInt
          val v = new String(p, bp, len, "UTF-8"); bp += len; v
        case other =>
          throw new IllegalArgumentException(s"gpkg: reserved serial type $other")
      }
    }
  }

  /** Test seam: full byte-level scan of one table — open → sqlite_master
    * → b-tree walk (overflow chains included) → record decode. The
    * GpkgCodecSpec roundtrips engine-written files through this without
    * a SparkSession.
    */
  private[sources] def scanTable(bytes: Array[Byte], table: String): Seq[(Long, Seq[Any])] = {
    val db = open(bytes)
    val root = master(db)
      .collectFirst { case ("table", name, r, _) if name == table => r }
      .getOrElse(throw new IllegalArgumentException(s"gpkg: no table $table"))
    tableRows(db, root).map { case (rid, p) => (rid, record(p)) }
  }

  /** Bbox candidates through a stored GPKG rtree at ANY depth: the root
    * (nodeno 1) declares the tree depth; interior cells hold (child
    * nodeno, f32 bbox) and are descended only when their bbox overlaps
    * the query; leaf cells hold (feature rowid, f32 bbox). f32 bboxes →
    * candidates only, callers re-apply the exact predicate (the standard
    * rtree caveat). Loud on a missing index, a missing child node, or a
    * malformed depth — any real GDAL-written layer has depth >= 1
    * (SQLite packs ~51 entries/node), the exact analog of the FGB packed
    * Hilbert index read.
    */
  def rtreeRowids(bytes: Array[Byte], table: String, xmin: Double,
      ymin: Double, xmax: Double, ymax: Double): Seq[Long] = {
    val db = open(bytes)
    val nodeTable = s"rtree_${table}_geom_node"
    val root = master(db)
      .collectFirst { case ("table", n, r, _) if n == nodeTable => r }
      .getOrElse(throw new IllegalArgumentException(
        s"gpkg: no rtree index for $table (shadow table $nodeTable absent)"))
    val nodes = tableRows(db, root)
    require(nodes.nonEmpty, s"gpkg: rtree node table $nodeTable is empty")
    // nodeno = the shadow table's rowid (INTEGER PRIMARY KEY alias)
    val nodeMap: Map[Long, Array[Byte]] = nodes.map { case (no, p) =>
      no -> record(p)(1).asInstanceOf[Array[Byte]]
    }.toMap
    val rootData = nodeMap.getOrElse(1L, throw new IllegalArgumentException(
      s"gpkg: rtree node table $nodeTable has no root (nodeno 1)"))
    val depth = ByteBuffer.wrap(rootData).getShort()
    require(depth >= 0 && depth <= 40,
      s"gpkg: rtree depth $depth out of range — malformed node blob")
    def walk(data: Array[Byte], level: Int): Seq[Long] = {
      val bb = ByteBuffer.wrap(data) // rtree module storage is big-endian
      bb.getShort() // depth on the root, unused elsewhere
      val n = bb.getShort()
      (0 until n).flatMap { _ =>
        val id = bb.getLong()
        val mnx = bb.getFloat(); val mxx = bb.getFloat()
        val mny = bb.getFloat(); val mxy = bb.getFloat()
        if (mxx < xmin || mnx > xmax || mxy < ymin || mny > ymax) Nil
        else if (level == 0) Seq(id)
        else walk(nodeMap.getOrElse(id, throw new IllegalArgumentException(
          s"gpkg: rtree interior cell points at missing node $id")), level - 1)
      }
    }
    walk(rootData, depth)
  }

  /** sqlite_master rows: (type, name, rootpage, sql). Root is page 1. */
  private def master(db: Db): Seq[(String, String, Int, String)] =
    tableRows(db, 1).map { case (_, p) =>
      val r = record(p)
      (r(0).asInstanceOf[String], r(1).asInstanceOf[String],
        r(3).asInstanceOf[Long].toInt, r(4) match { case s: String => s; case _ => "" })
    }

  /** Top-level comma groups inside a CREATE TABLE's parens (shared by
    * [[columnNames]] and [[rowidAlias]]).
    */
  private def topLevelGroups(sql: String): Seq[String] = {
    val open = sql.indexOf('(')
    require(open >= 0, s"gpkg: no column list in: $sql")
    var depth = 0
    var i = open
    val groups = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var done = false
    while (i < sql.length && !done) {
      val ch = sql.charAt(i)
      ch match {
        case '(' =>
          depth += 1; if (depth > 1) cur.append(ch)
        case ')' =>
          depth -= 1
          if (depth == 0) { groups += cur.toString; done = true } else cur.append(ch)
        case ',' if depth == 1 => groups += cur.toString; cur.clear()
        case c => if (depth >= 1) cur.append(c)
      }
      i += 1
    }
    groups.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Column names from a CREATE TABLE statement — minimal parse: the
    * first identifier of each top-level comma group inside the parens,
    * skipping table-level constraint clauses. Covers the DDL a GPKG
    * producer writes; exotic DDL fails loudly downstream (name lookup).
    */
  private[sources] def columnNames(sql: String): Seq[String] = {
    val constraintKw = Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
    topLevelGroups(sql)
      .filterNot(g => constraintKw.contains(g.split("[\\s(]+")(0).toUpperCase))
      .map(firstIdent)
  }

  /** First identifier of a column-definition group, quote-aware
    * (`"a b"`, `` `x` ``, `[y]` are single identifiers with spaces
    * allowed inside).
    */
  private def firstIdent(group: String): String = {
    val t = group.trim
    t.charAt(0) match {
      case '"' => t.substring(1, t.indexOf('"', 1))
      case '`' => t.substring(1, t.indexOf('`', 1))
      case '[' => t.substring(1, t.indexOf(']', 1))
      case _ => t.split("[\\s(]+")(0)
    }
  }

  /** The rowid-alias column (`INTEGER … PRIMARY KEY` in a column
    * definition — intervening constraints like NOT NULL are legal, and
    * the identifier may be quoted), if declared: its record value is
    * NULL and the rowid carries the value.
    */
  private[sources] def rowidAlias(sql: String): Option[String] = {
    if (sql.indexOf('(') < 0) return None
    topLevelGroups(sql).find { g =>
      val ident = firstIdent(g)
      val rest = g.trim.drop(
        if ("\"`[".indexOf(g.trim.charAt(0)) >= 0) ident.length + 2 else ident.length)
      rest.toUpperCase.matches("""(?s)\s+INTEGER\b.*PRIMARY\s+KEY.*""")
    }.map(firstIdent)
  }

  // ------------------------------------------------------ gpkg geometry

  /** GPKG geometry blob → (srid, standard WKB): magic `GP`, version,
    * flags (envelope-size code in bits 1–3, header byte order in bit 0),
    * srs_id, envelope doubles skipped, then the WKB as-is.
    */
  private[sources] def gpkgToWkb(blob: Array[Byte]): (Int, Array[Byte]) = {
    require(blob.length >= 8 && blob(0) == 'G' && blob(1) == 'P',
      "gpkg: bad geometry blob magic")
    val flags = blob(3) & 0xFF
    // bit 5 = ExtendedGeoPackageBinary (extra extension_code bytes this
    // parser does not know), bit 4 = empty geometry (WKB would be an
    // empty/NaN form) — both rejected loudly rather than misread
    require((flags & 0x20) == 0, "gpkg: extended geometry blob unsupported here")
    require((flags & 0x10) == 0, "gpkg: empty-geometry blob unsupported here")
    val envCode = (flags >> 1) & 0x7
    val envDoubles = envCode match {
      case 0 => 0
      case 1 => 4
      case 2 | 3 => 6
      case 4 => 8
      case other => throw new IllegalArgumentException(s"gpkg: bad envelope code $other")
    }
    val order = if ((flags & 1) == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val srid = ByteBuffer.wrap(blob, 4, 4).order(order).getInt
    (srid, java.util.Arrays.copyOfRange(blob, 8 + 8 * envDoubles, blob.length))
  }

  /** Feature tables registered in `gpkg_contents` with their geometry
    * column (from `gpkg_geometry_columns`): (table, geomColumn, srid).
    */
  def featureTables(bytes: Array[Byte]): Seq[(String, String, Int)] = {
    val db = open(bytes)
    featureTablesOf(db, master(db))
  }

  private def featureTablesOf(db: Db,
      m: Seq[(String, String, Int, String)]): Seq[(String, String, Int)] = {
    def root(t: String): Int = m.find(r => r._1 == "table" && r._2 == t)
      .map(_._3).getOrElse(throw new IllegalArgumentException(s"gpkg: no table $t"))
    def cols(t: String): Seq[String] = columnNames(
      m.find(r => r._1 == "table" && r._2 == t).get._4)
    val cc = cols("gpkg_contents")
    val contents = tableRows(db, root("gpkg_contents")).map(r => record(r._2))
      .filter(r => r(cc.indexOf("data_type")) == "features")
      .map(r => r(cc.indexOf("table_name")).asInstanceOf[String])
    val gc = cols("gpkg_geometry_columns")
    val geomCols = tableRows(db, root("gpkg_geometry_columns")).map(r => record(r._2))
      .map(r => r(gc.indexOf("table_name")).asInstanceOf[String] ->
        (r(gc.indexOf("column_name")).asInstanceOf[String],
          r(gc.indexOf("srs_id")).asInstanceOf[Long].toInt))
      .toMap
    contents.map { t =>
      val (g, srid) = geomCols.getOrElse(t,
        throw new IllegalArgumentException(s"gpkg: $t missing from gpkg_geometry_columns"))
      (t, g, srid)
    }
  }

  /** GeoPackage glob → the canonical feature envelope (the [[GeoJson]]/
    * [[Shapefile]] contract). Geometry becomes EWKB carrying the blob's
    * SRID; non-geometry columns become string props; `idField` supplies
    * feature_id (rowid-alias columns resolve through the rowid). One
    * open + one sqlite_master walk per file — metadata discovery and the
    * feature-table read share the parse.
    */
  def read(spark: SparkSession, pathGlob: String, table: String,
      idField: String, eventTsUs: Long = 0L): DataFrame =
    readImpl(spark, pathGlob, table, idField, eventTsUs, None)

  /** Index-pruned window scan: candidates come from the stored rtree
    * ([[rtreeRowids]], any depth — loud when the file has no index), and
    * ONLY candidate rows are fetched, via selective b-tree descent
    * ([[tableRowsSelect]] skips whole subtrees outside the candidate
    * rowid set — pages off the path are never decoded). f32 index bboxes
    * make these candidates, not answers: callers re-apply the exact
    * predicate on the decoded geometry, the filter-then-refine shape of
    * every spatial index. Scale: per-FILE pruning inside a distributed
    * binaryFile scan — bytes decoded ∝ matches + index, not layer size.
    */
  def readBbox(spark: SparkSession, pathGlob: String, table: String,
      idField: String, xmin: Double, ymin: Double, xmax: Double,
      ymax: Double, eventTsUs: Long = 0L): DataFrame =
    readImpl(spark, pathGlob, table, idField, eventTsUs,
      Some((xmin, ymin, xmax, ymax)))

  private def readImpl(spark: SparkSession, pathGlob: String, table: String,
      idField: String, eventTsUs: Long,
      window: Option[(Double, Double, Double, Double)]): DataFrame = {
    import spark.implicits._
    val rows = spark.read.format("binaryFile").load(pathGlob)
      .select(input_file_name().as("src"), $"content")
      .as[(String, Array[Byte])]
    rows.flatMap { case (src, bytes) =>
      val db = open(bytes)
      val m = master(db)
      val geomCol = featureTablesOf(db, m).find(_._1 == table).map(_._2)
        .getOrElse(throw new IllegalArgumentException(
          s"gpkg: $table is not a registered feature table in $src"))
      val entry = m.find(r => r._1 == "table" && r._2 == table)
        .getOrElse(throw new IllegalArgumentException(s"gpkg: no table $table"))
      val names = columnNames(entry._4)
      val alias = rowidAlias(entry._4)
      val recs = window match {
        case None =>
          tableRows(db, entry._3).map { case (rid, p) => (rid, record(p)) }
        case Some((x0, y0, x1, y1)) =>
          val cands = rtreeRowids(bytes, table, x0, y0, x1, y1)
          tableRowsSelect(db, entry._3, cands.sorted.toArray)
            .map { case (rid, p) => (rid, record(p)) }
      }
      val gi = names.indexOf(geomCol)
      val ii = names.indexOf(idField)
      require(ii >= 0, s"gpkg: id field $idField not in ${names.mkString(",")}")
      recs.map { case (rowid, vals) =>
        val idVal = vals(ii) match {
          case null if alias.contains(idField) => rowid.toString
          case null => null
          case v => v.toString
        }
        val wkb = vals(gi) match {
          case null => null
          case b: Array[Byte] =>
            val (srid, w) = gpkgToWkb(b)
            if (srid > 0) Wkb.setSrid(w, srid) else w
          case other => throw new IllegalArgumentException(
            s"gpkg: geometry column holds ${other.getClass.getSimpleName}")
        }
        val props = names.zipWithIndex.collect {
          case (n, i) if i != gi =>
            n -> (vals(i) match {
              case null => if (i == ii && alias.contains(idField)) rowid.toString else null
              case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
              case v => v.toString
            })
        }.toMap
        ShpFeature(table, idVal, wkb, props, eventTsUs, src, 1)
      }
    }.toDF()
      .select($"layer", $"feature_id", $"geom_wkb", $"props",
        timestamp_micros($"event_ts_us").as("event_ts"), $"source", $"fmt_version")
  }
}

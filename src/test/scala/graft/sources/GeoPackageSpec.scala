package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.Wkb

/** Parses `src/test/resources/sample.gpkg` — genuine SQLite 3 output
  * (python stdlib sqlite3, 2505 rows → multi-page table b-tree with
  * interior pages, one 20 kB text value → overflow-page chain, NULL
  * geometry/text rows, full GPKG metadata tables) — so the reader is
  * pinned against real-world bytes, not this repo's own writing.
  */
class GeoPackageSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session
  private lazy val gpkgPath =
    getClass.getResource("/sample.gpkg").getPath

  private lazy val bytes =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(gpkgPath))

  test("featureTables: discovery through gpkg_contents + geometry_columns") {
    assert(GeoPackage.featureTables(bytes) == Seq(("poi", "geom", 4326)))
  }

  test("columnNames/rowidAlias: minimal DDL parse") {
    val ddl = """CREATE TABLE poi (fid INTEGER PRIMARY KEY, name TEXT, rank INTEGER,
                 score REAL, note TEXT, geom BLOB)"""
    assert(GeoPackage.columnNames(ddl) == Seq("fid", "name", "rank", "score", "note", "geom"))
    assert(GeoPackage.rowidAlias(ddl).contains("fid"))
    val ddl2 = """CREATE TABLE t ("a b" TEXT, c INTEGER, PRIMARY KEY (c), CHECK (c > 0))"""
    assert(GeoPackage.columnNames(ddl2) == Seq("a b", "c"))
    assert(GeoPackage.rowidAlias(ddl2).isEmpty,
      "a table-level PRIMARY KEY is not a rowid alias")
    // legal alias forms: quoted identifier (spaces inside), constraints
    // between INTEGER and PRIMARY KEY — both are rowid aliases in SQLite
    assert(GeoPackage.rowidAlias(
      """CREATE TABLE t ("feature id" INTEGER PRIMARY KEY, v TEXT)""")
      .contains("feature id"))
    assert(GeoPackage.rowidAlias(
      "CREATE TABLE t (fid INTEGER NOT NULL PRIMARY KEY AUTOINCREMENT, v TEXT)")
      .contains("fid"))
    assert(GeoPackage.rowidAlias(
      "CREATE TABLE t (fid BIGINT PRIMARY KEY, v TEXT)").isEmpty,
      "only the exact INTEGER type aliases the rowid")
  }

  test("read: every row surfaces with exact values, rowid-alias ids, null geometry kept") {
    val rows = GeoPackage.read(spark, gpkgPath, "poi", "fid", 5000000L).collect()
    assert(rows.length == 2504, s"expected 2504 rows, got ${rows.length}")
    val byId = rows.map(r => r.getAs[String]("feature_id") -> r).toMap
    // hand-planted rows
    val m = byId("1")
    assert(m.getAs[Map[String, String]]("props")("name") == "munich")
    assert(m.getAs[Map[String, String]]("props")("rank") == "5")
    assert(m.getAs[Map[String, String]]("props")("score") == "1.5")
    assert(m.getAs[Map[String, String]]("props")("note") == null)
    val mw = m.getAs[Array[Byte]]("geom_wkb")
    assert(Wkb.srid(mw) == 4326, "SRID carried from the gpkg blob header")
    assert(Wkb.bbox(mw) == Wkb.BBox(11.5, 48.1, 11.5, 48.1))
    assert(byId("2").getAs[Map[String, String]]("props")("score") == "-2.25")
    assert(byId("3").getAs[Array[Byte]]("geom_wkb") == null, "null geometry row")
    // the overflow-chain row: 20000-char text must come back intact
    val ov = byId("9000").getAs[Map[String, String]]("props")
    assert(ov("note") == "z" * 20000, s"overflow text length ${ov("note").length}")
    assert(ov("name") == "overflow")
    // spot-check generated rows. SQLite's record format stores a REAL
    // whose value is integral as an INTEGER serial (lossless) — so
    // 250.0 surfaces as "250" (fid 1000) while 250.25 stays REAL
    val g = byId("1000").getAs[Map[String, String]]("props")
    assert(g("name") == "p1000" && g("rank") == (1000 % 7).toString && g("score") == "250")
    val g2 = byId("1001").getAs[Map[String, String]]("props")
    assert(g2("score") == "250.25", g2("score"))
    val gw = byId("1001").getAs[Array[Byte]]("geom_wkb")
    val ex = Wkb.BBox(11.0 + (1001 % 100) / 100.0, 40.0 + (1001 % 90) / 10.0,
      11.0 + (1001 % 100) / 100.0, 40.0 + (1001 % 90) / 10.0)
    assert(Wkb.bbox(gw) == ex, s"${Wkb.bbox(gw)} vs $ex")
    // envelope columns
    assert(rows.head.getAs[String]("layer") == "poi")
    assert(rows.head.getAs[java.sql.Timestamp]("event_ts").getTime == 5000L)
  }

  test("writeGpkg → read roundtrip: multi-leaf b-tree, rowid-alias ids, SRID carried") {
    // enough rows to force an interior page at 64 KiB (~900 rows/leaf)
    val rows = (1L to 3000L).map(i =>
      (i, s"t${i % 5}", GeoPackage.pointBlob(i / 100.0, -i / 200.0, 4326)))
    val bytes = GeoPackage.writeGpkg("events", 4326, rows)
    assert(GeoPackage.featureTables(bytes) == Seq(("events", "geom", 4326)))
    val dir = java.nio.file.Files.createTempDirectory("gpkg_rt")
    java.nio.file.Files.write(dir.resolve("e.gpkg"), bytes)
    val got = GeoPackage.read(spark, s"$dir/e.gpkg", "events", "fid").collect()
    assert(got.length == 3000)
    val r7 = got.find(_.getAs[String]("feature_id") == "777").get
    assert(r7.getAs[Map[String, String]]("props")("etype") == "t2")
    val w = r7.getAs[Array[Byte]]("geom_wkb")
    assert(Wkb.srid(w) == 4326)
    assert(Wkb.bbox(w) == Wkb.BBox(7.77, -3.885, 7.77, -3.885))
  }

  test("rtree extension: indexed file reads identically, rtree candidates correct, loud arms") {
    val rows = (1L to 400L).map(i =>
      (i, s"t${i % 5}", GeoPackage.pointBlob(i % 20 * 1.0, (i / 20) * 1.0, 4326)))
    val plain = GeoPackage.writeGpkg("events", 4326, rows)
    val indexed = GeoPackage.writeGpkg("events", 4326, rows, rtree = true)
    // wild-form tolerance: the extension tables (virtual-table master row
    // with rootpage 0 included) must not perturb discovery or the scan
    assert(GeoPackage.featureTables(indexed) == Seq(("events", "geom", 4326)))
    val dir = java.nio.file.Files.createTempDirectory("gpkg_rtree")
    java.nio.file.Files.write(dir.resolve("p.gpkg"), plain)
    java.nio.file.Files.write(dir.resolve("i.gpkg"), indexed)
    def ids(f: String) = GeoPackage.read(spark, s"$dir/$f", "events", "fid")
      .select("feature_id").collect().map(_.getString(0)).sorted.toSeq
    assert(ids("i.gpkg") == ids("p.gpkg"))
    // the stored index is parseable, not decorative: rtree candidates
    // equal the brute-force window subset (f32 bboxes are exact here —
    // small integer coordinates)
    val got = GeoPackage.rtreeRowids(indexed, "events", 3.5, 2.5, 8.5, 6.5).sorted
    val want = rows.collect {
      case (fid, _, _) if fid % 20 >= 4 && fid % 20 <= 8 &&
        fid / 20 >= 3 && fid / 20 <= 6 => fid
    }.sorted
    assert(got == want && got.nonEmpty, s"got ${got.length}, want ${want.length}")
    // loud arms: no index on the plain file; oversized layer refuses
    val e1 = intercept[IllegalArgumentException] {
      GeoPackage.rtreeRowids(plain, "events", 0, 0, 1, 1)
    }
    assert(e1.getMessage.contains("no rtree index"))
    // depth >= 2: 2900 points on a 100x29 grid — 51 entries/node packs
    // into 57 leaves, 2 interior nodes, 1 root; candidates must still
    // equal the brute-force window subset through the two-level descent
    val big = (1L to 2900L).map(i =>
      (i, "t", GeoPackage.pointBlob(i % 100 * 1.0, (i / 100) * 1.0, 4326)))
    val bigBytes = GeoPackage.writeGpkg("events", 4326, big, rtree = true)
    val gotBig = GeoPackage.rtreeRowids(bigBytes, "events", 10.5, 3.5, 20.5, 7.5).sorted
    val wantBig = big.collect {
      case (fid, _, _) if fid % 100 >= 11 && fid % 100 <= 20 &&
        fid / 100 >= 4 && fid / 100 <= 7 => fid
    }.sorted
    assert(gotBig == wantBig && gotBig.nonEmpty,
      s"multi-level: got ${gotBig.length}, want ${wantBig.length}")
    // the full scan still reads the indexed file identically
    val dirB = java.nio.file.Files.createTempDirectory("gpkg_rtree_big")
    java.nio.file.Files.write(dirB.resolve("b.gpkg"), bigBytes)
    assert(GeoPackage.read(spark, s"$dirB/b.gpkg", "events", "fid").count() == 2900)
    // the writer lifts envelopes at fixed offsets, so a caller blob whose
    // flags byte says "no envelope" (code 0) or big-endian header must
    // refuse loudly, not emit a garbage f32 bbox that silently drops
    // true candidates
    val noEnv = GeoPackage.pointBlob(1.0, 1.0, 4326).clone()
    noEnv(3) = (noEnv(3) & ~0x0E).toByte // envelope indicator → 0
    val e3 = intercept[IllegalArgumentException] {
      GeoPackage.writeGpkg("events", 4326, Seq((1L, "t", noEnv)), rtree = true)
    }
    assert(e3.getMessage.contains("envelope"), e3.getMessage)
    val bigEndian = GeoPackage.pointBlob(1.0, 1.0, 4326).clone()
    bigEndian(3) = (bigEndian(3) & ~0x01).toByte // byte-order bit → BE
    val e4 = intercept[IllegalArgumentException] {
      GeoPackage.writeGpkg("events", 4326, Seq((1L, "t", bigEndian)), rtree = true)
    }
    assert(e4.getMessage.contains("flags"), e4.getMessage)
  }

  test("rtree writer rounds f32 bboxes DIRECTIONALLY — a nearest-rounded-down max never drops a true match") {
    // 0.7f < 0.7 (nearest rounds DOWN): a plain .toFloat max would store
    // maxx < 0.7 and a window starting exactly at 0.7 would silently
    // miss the feature; the module's rtreeValueUp discipline keeps every
    // f32 cell a superset of the true envelope
    val rows = Seq((1L, "t", GeoPackage.pointBlob(0.7, 0.1, 4326)),
      (2L, "t", GeoPackage.pointBlob(0.1, 0.7, 4326)))
    val indexed = GeoPackage.writeGpkg("events", 4326, rows, rtree = true)
    assert(GeoPackage.rtreeRowids(indexed, "events", 0.7, 0.0, 1.0, 1.0) == Seq(1L))
    assert(GeoPackage.rtreeRowids(indexed, "events", 0.0, 0.7, 1.0, 1.0) == Seq(2L))
    // and the min side: 0.1f > 0.1 (nearest rounds UP) — a window ending
    // exactly at 0.1 must still see the feature at x = 0.1
    assert(GeoPackage.rtreeRowids(indexed, "events", 0.0, 0.5, 0.1, 1.0) == Seq(2L))
  }

  test("GENUINE SQLite rtree: depth-2 tree written by the real rtree module walks correctly") {
    // src/test/resources/sample_rtree.gpkg is real SQLite 3 output: 3000
    // points on a 60x50 grid through CREATE VIRTUAL TABLE ... USING
    // rtree — the module packs 51 entries/node, so the tree is depth 2
    // (105 nodes). The engine's any-depth walk must agree with brute
    // force on the module's OWN packing, not just our writer's.
    val p = getClass.getResource("/sample_rtree.gpkg")
    assert(p != null, "sample_rtree.gpkg missing from test resources")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p.toURI))
    val got = GeoPackage.rtreeRowids(bytes, "pts", 10.5, 3.5, 20.5, 7.5).sorted
    val want = (1L to 3000L).filter { fid =>
      val x = (fid - 1) % 60; val y = (fid - 1) / 60
      x >= 11 && x <= 20 && y >= 4 && y <= 7
    }.sorted
    assert(got == want && got.nonEmpty, s"got ${got.length}, want ${want.length}")
    // index-pruned scan over the genuine file == full scan + exact filter
    val path = java.nio.file.Paths.get(p.toURI).toString
    val pruned = GeoPackage.readBbox(spark, path, "pts", "fid", 10.5, 3.5, 20.5, 7.5)
      .select("feature_id").collect().map(_.getString(0).toLong).sorted.toSeq
    assert(pruned == want, s"readBbox ${pruned.length} vs ${want.length}")
  }

  test("loud failures: non-sqlite bytes, unknown table") {
    intercept[Exception] {
      GeoPackage.featureTables("not a database".getBytes)
    }
    intercept[Exception] {
      GeoPackage.read(spark, gpkgPath, "nope", "fid").collect()
    }
  }
}

package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class OsmPbfSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  private def nodes(n: Int): Seq[OsmPbf.Node] =
    (0 until n).map { i =>
      OsmPbf.Node(1000L + i * 7,
        (i.toLong * 1234567 - 900000000L) * 100L,
        (i.toLong * 321987 - 450000000L) * 100L,
        if (i % 3 == 0) Map("etype" -> s"t${i % 5}", "name" -> s"n$i") else Map.empty)
    }

  test("write → parse roundtrips ids, nanodegree coords, and tags exactly across raw AND zlib blobs") {
    // blobsOf=16 over 50 nodes → 4 data blobs: 2 raw, 2 zlib-deflated —
    // both Blob compression legs and the per-blob delta restart exercise
    val ns = nodes(50)
    val bytes = OsmPbf.write(ns, blobsOf = 16)
    val back = OsmPbf.parse(bytes)
    assert(back == ns)
    // negative coords went through zigzag (western/southern hemisphere)
    assert(ns.exists(_.lonNano < 0) && ns.exists(_.latNano < 0))
  }

  test("distributed read matches parse; tags surface as a map column") {
    import spark.implicits._
    val ns = nodes(30)
    val dir = Files.createTempDirectory("osmpbf_spec")
    Files.write(dir.resolve("a.osm.pbf"), OsmPbf.write(ns.take(15), blobsOf = 7))
    Files.write(dir.resolve("b.osm.pbf"), OsmPbf.write(ns.drop(15), blobsOf = 7))
    val got = OsmPbf.read(spark, dir.toString + "/*.osm.pbf")
      .select($"id", $"lonNano", $"latNano", $"tags")
      .collect().map(r => OsmPbf.Node(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Map[String, String]](3)))
      .sortBy(_.id)
    assert(got.toSeq == ns.sortBy(_.id))
  }

  test("readSplit: one task per blob equals the whole-file read; header refusal happens at index time") {
    import spark.implicits._
    val ns = nodes(60)
    val dir = Files.createTempDirectory("osmpbf_split")
    // one file, 9 data blobs (raw and zlib interleaved) — the
    // single-huge-file shape blob splitting exists for
    Files.write(dir.resolve("planet.osm.pbf"), OsmPbf.write(ns, blobsOf = 7))
    val whole = OsmPbf.read(spark, dir.toString + "/*.osm.pbf")
      .collect().map(_.toString).sorted.toSeq
    val split = OsmPbf.readSplit(spark, dir.toString + "/*.osm.pbf")
      .collect().map(_.toString).sorted.toSeq
    assert(split == whole && split.length == 60)
    // the index pass reads headers only, and it is where an unsupported
    // required feature gets refused — before any task runs
    val conf = spark.sparkContext.hadoopConfiguration
    val refs = OsmPbf.indexBlobs(conf,
      new org.apache.hadoop.fs.Path(dir.resolve("planet.osm.pbf").toString))
    assert(refs.length == 9, s"expected 9 OSMData blobs, got ${refs.length}")
    val bad = OsmPbf.write(ns.take(4))
    val idx = bad.indexOfSlice("DenseNodes".getBytes("UTF-8"))
    bad(idx + 9) = 'z'.toByte
    Files.write(dir.resolve("bad.osm.pbf"), bad)
    val e = intercept[IllegalArgumentException] {
      OsmPbf.indexBlobs(conf,
        new org.apache.hadoop.fs.Path(dir.resolve("bad.osm.pbf").toString))
    }
    assert(e.getMessage.contains("unsupported feature"))
  }

  test("ways roundtrip: plain-varint id, packed keys/vals, zigzag-delta refs across raw AND zlib blobs") {
    val ns = nodes(20)
    val ids = ns.map(_.id)
    val ws = Seq(
      OsmPbf.Way(1L, Seq(ids(0), ids(3), ids(5), ids(0)), Map("building" -> "yes")),
      OsmPbf.Way(2L, Seq(ids(7), ids(2), ids(9)), Map("highway" -> "path")),
      // descending refs force NEGATIVE deltas through the zigzag leg
      OsmPbf.Way(3L, Seq(ids(9), ids(4), ids(1)), Map.empty),
      OsmPbf.Way(4L, Seq(ids(10), ids(11), ids(12), ids(10)), Map("area" -> "yes")))
    // blobsOf=2 → 2 way blobs, one raw and one deflated
    val bytes = OsmPbf.writeAll(ns, ws, blobsOf = 2)
    val (backNodes, backWays) = OsmPbf.parseAll(bytes)
    assert(backNodes == ns && backWays == ws)
    // the strict nodes-only reader must refuse the mixed file loudly
    val e = intercept[IllegalArgumentException] { OsmPbf.parse(bytes) }
    assert(e.getMessage.contains("ways"))
  }

  test("assembleWays: polygon heuristic (closed+area/building), closure-only stays a line, dangling ref is loud") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ns = Seq(
      OsmPbf.Node(1, 0L, 0L, Map.empty),
      OsmPbf.Node(2, 1000000000L, 0L, Map.empty),
      OsmPbf.Node(3, 1000000000L, 1000000000L, Map.empty),
      OsmPbf.Node(4, 0L, 1000000000L, Map.empty))
    val ws = Seq(
      OsmPbf.Way(10, Seq(1L, 2L, 3L, 4L, 1L), Map("building" -> "yes")),
      OsmPbf.Way(11, Seq(1L, 2L, 3L, 4L, 1L), Map("note" -> "ring")), // closed, untagged
      OsmPbf.Way(12, Seq(1L, 2L, 3L), Map("area" -> "yes"))) // open despite area
    val dir = Files.createTempDirectory("osmpbf_ways")
    Files.write(dir.resolve("w.osm.pbf"), OsmPbf.writeAll(ns, ws))
    val feats = OsmPbf.wayFeatures(spark, dir.toString + "/*.osm.pbf")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(feats == Map(10L -> "POLYGON", 11L -> "LINESTRING", 12L -> "LINESTRING"))
    // geometry really is the planted square: area of way 10's polygon = 1.0
    val wkb = OsmPbf.wayFeatures(spark, dir.toString + "/*.osm.pbf")
      .filter(col("way_id") === 10L).select(col("geom")).head().getAs[Array[Byte]](0)
    assert(math.abs(graft.functions.Wkb.area(wkb) - 1.0) < 1e-12)
    // dangling ref (node 99 absent): the assembly must throw, not shorten
    val bad = Seq(OsmPbf.Way(13, Seq(1L, 99L, 3L), Map.empty))
    Files.write(dir.resolve("bad.osm.pbf"), OsmPbf.writeAll(ns, bad))
    val e = intercept[Exception] {
      OsmPbf.wayFeatures(spark, dir.resolve("bad.osm.pbf").toString).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("dangling") ||
      Option(e.getCause).exists(_.getMessage.contains("dangling")))
  }

  private def chainMessage(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")

  test("loud arms: ALL-dangling way, empty-refs way, duplicate node ids, empty-member multipolygon") {
    val ns = Seq(
      OsmPbf.Node(1, 0L, 0L, Map.empty),
      OsmPbf.Node(2, 1000000000L, 0L, Map.empty))
    val dir = Files.createTempDirectory("osmpbf_loud")
    // ALL refs missing from the node store: the old inner join dropped the
    // way silently; the left-join contract must throw "dangling" instead
    Files.write(dir.resolve("alldangling.osm.pbf"),
      OsmPbf.writeAll(ns, Seq(OsmPbf.Way(20, Seq(97L, 98L, 99L), Map.empty))))
    val e1 = intercept[Exception] {
      OsmPbf.wayFeatures(spark, dir.resolve("alldangling.osm.pbf").toString).collect()
    }
    assert(chainMessage(e1).contains("dangling"), chainMessage(e1))
    // empty refs list: no geometry to assemble — loud, not an empty line
    Files.write(dir.resolve("norefs.osm.pbf"),
      OsmPbf.writeAll(ns, Seq(OsmPbf.Way(21, Seq.empty, Map.empty))))
    val e2 = intercept[Exception] {
      OsmPbf.wayFeatures(spark, dir.resolve("norefs.osm.pbf").toString).collect()
    }
    assert(chainMessage(e2).contains("empty refs"), chainMessage(e2))
    // the same node id in two globbed files: the refs→nodes join fans out
    // (n_joined > n_refs) — named refusal, not "negative dangling refs"
    val dup = Files.createTempDirectory("osmpbf_dup")
    Files.write(dup.resolve("a.osm.pbf"),
      OsmPbf.writeAll(ns, Seq(OsmPbf.Way(22, Seq(1L, 2L), Map.empty))))
    Files.write(dup.resolve("b.osm.pbf"), OsmPbf.write(ns))
    val e3 = intercept[Exception] {
      OsmPbf.wayFeatures(spark, dup.toString + "/*.osm.pbf").collect()
    }
    assert(chainMessage(e3).contains("duplicate"), chainMessage(e3))
    // a type=multipolygon relation with NO members: posexplode_outer keeps
    // the row and the build refuses with the relation id
    Files.write(dir.resolve("nomembers.osm.pbf"),
      OsmPbf.writeFull(ns, Seq.empty,
        Seq(OsmPbf.Relation(30L, Seq.empty, Seq.empty, Seq.empty,
          Map("type" -> "multipolygon")))))
    val e4 = intercept[Exception] {
      OsmPbf.multipolygonFeatures(spark, dir.resolve("nomembers.osm.pbf").toString).collect()
    }
    assert(chainMessage(e4).contains("no members") && chainMessage(e4).contains("30"),
      chainMessage(e4))
  }

  test("routes: chain merge (reversal, disconnection), stops counted, multi-level nesting, loud cycle/depth/missing arms") {
    import org.apache.spark.sql.functions.col
    val ns = Seq(
      OsmPbf.Node(1, 0L, 0L, Map.empty),
      OsmPbf.Node(2, 1000000000L, 0L, Map.empty),
      OsmPbf.Node(3, 2000000000L, 0L, Map.empty),
      OsmPbf.Node(4, 3000000000L, 0L, Map.empty),
      OsmPbf.Node(5, 5000000000L, 0L, Map.empty),
      OsmPbf.Node(6, 6000000000L, 0L, Map.empty))
    val ws = Seq(
      OsmPbf.Way(10, Seq(1L, 2L), Map.empty),
      OsmPbf.Way(11, Seq(3L, 2L), Map.empty), // tail-to-tail: must reverse
      OsmPbf.Way(12, Seq(3L, 4L), Map.empty),
      OsmPbf.Way(13, Seq(5L, 6L), Map.empty)) // disconnected
    val dir = Files.createTempDirectory("osmpbf_routes")
    // route 100: 10+11+12 chain into ONE line, 13 is its own chain; one stop
    Files.write(dir.resolve("r.osm.pbf"), OsmPbf.writeFull(ns, ws, Seq(
      OsmPbf.Relation(100L, Seq(10L, 11L, 12L, 13L, 1L),
        Seq("", "", "", "", "stop"), Seq(1, 1, 1, 1, 0),
        Map("type" -> "route", "route" -> "bus")))))
    val row = OsmPbf.routeFeatures(spark, dir.resolve("r.osm.pbf").toString).head()
    assert(row.getAs[String]("kind") == "MULTILINESTRING")
    assert(row.getAs[Long]("n_ways") == 4L && row.getAs[Long]("n_stops") == 1L &&
      row.getAs[Long]("n_chains") == 2L)
    val parts = graft.functions.Wkb.linePartsPoints(row.getAs[Array[Byte]]("geom"))
    // merged chain starts at way 10 and runs 1→2→3→4 (11 reversed in place)
    assert(parts.map(_.length) == Seq(4, 2))
    assert(parts.head.map(_._1) == Seq(0.0, 1.0, 2.0, 3.0))
    // nested one level: child route_section carries the ways
    Files.write(dir.resolve("nested.osm.pbf"), OsmPbf.writeFull(ns, ws.take(3), Seq(
      OsmPbf.Relation(300L, Seq(10L, 11L, 12L), Seq("", "", ""), Seq(1, 1, 1),
        Map("type" -> "route_section")),
      OsmPbf.Relation(200L, Seq(300L), Seq(""), Seq(2),
        Map("type" -> "route")))))
    val nrow = OsmPbf.routeFeatures(spark, dir.resolve("nested.osm.pbf").toString)
      .filter(col("relation_id") === 200L).head()
    assert(nrow.getAs[String]("kind") == "LINESTRING" && nrow.getAs[Long]("n_ways") == 3L)
    // loud: child missing from the relation store
    Files.write(dir.resolve("nochild.osm.pbf"), OsmPbf.writeFull(ns, ws, Seq(
      OsmPbf.Relation(400L, Seq(999L), Seq(""), Seq(2), Map("type" -> "route")))))
    val e1 = intercept[Exception] {
      OsmPbf.routeFeatures(spark, dir.resolve("nochild.osm.pbf").toString).collect()
    }
    assert(chainMessage(e1).contains("missing from the relation store"), chainMessage(e1))
    // grandchild relation member (depth 3): the iterative resolution
    // substitutes through route → section → subsection to the ways; a
    // stop node INSIDE a child counts at any level. Way order follows the
    // position PATH: 502's ways (under pos 0) come before 500's own
    // direct way 13 (pos 1).
    Files.write(dir.resolve("deep.osm.pbf"), OsmPbf.writeFull(ns, ws, Seq(
      OsmPbf.Relation(500L, Seq(501L, 13L), Seq("", ""), Seq(2, 1),
        Map("type" -> "route")),
      OsmPbf.Relation(501L, Seq(502L, 1L), Seq("", "stop"), Seq(2, 0),
        Map("type" -> "route_section")),
      OsmPbf.Relation(502L, Seq(10L, 11L, 12L), Seq("", "", ""), Seq(1, 1, 1),
        Map("type" -> "route_section")))))
    val drow = OsmPbf.routeFeatures(spark, dir.resolve("deep.osm.pbf").toString)
      .filter(col("relation_id") === 500L).head()
    assert(drow.getAs[String]("kind") == "MULTILINESTRING" &&
      drow.getAs[Long]("n_ways") == 4L && drow.getAs[Long]("n_stops") == 1L &&
      drow.getAs[Long]("n_chains") == 2L, drow.toString)
    val dparts = graft.functions.Wkb.linePartsPoints(drow.getAs[Array[Byte]]("geom"))
    assert(dparts.map(_.length) == Seq(4, 2) &&
      dparts.head.map(_._1) == Seq(0.0, 1.0, 2.0, 3.0), dparts.toString)
    // the per-level persists ride the CacheRegistry ownership contract:
    // after the caller's releaseAll, no route-assembly RDD stays cached
    graft.CacheRegistry.releaseAll()
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked caches: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
    // loud: membership cycle (610 → 611 → 610)
    Files.write(dir.resolve("cycle.osm.pbf"), OsmPbf.writeFull(ns, ws, Seq(
      OsmPbf.Relation(610L, Seq(611L), Seq(""), Seq(2), Map("type" -> "route")),
      OsmPbf.Relation(611L, Seq(610L, 10L), Seq("", ""), Seq(2, 1),
        Map("type" -> "route_section")))))
    val e2 = intercept[Exception] {
      OsmPbf.routeFeatures(spark, dir.resolve("cycle.osm.pbf").toString).collect()
    }
    assert(chainMessage(e2).contains("CYCLE"), chainMessage(e2))
    // loud: deeper than the resolution cap (10 relations chained — the
    // 9th nested level is still a relation when the 8-iteration cap ends)
    val deepRels = (0 until 10).map { k =>
      OsmPbf.Relation(800L + k, Seq(if (k < 9) 801L + k else 10L), Seq(""),
        Seq(if (k < 9) 2 else 1),
        Map("type" -> (if (k == 0) "route" else "route_section")))
    }
    Files.write(dir.resolve("toodeep.osm.pbf"), OsmPbf.writeFull(ns, ws, deepRels))
    val e2b = intercept[Exception] {
      OsmPbf.routeFeatures(spark, dir.resolve("toodeep.osm.pbf").toString)
        .filter(col("relation_id") === 800L).collect()
    }
    assert(chainMessage(e2b).contains("deeper than"), chainMessage(e2b))
    // loud: route with ONLY stop members has no geometry
    Files.write(dir.resolve("onlystops.osm.pbf"), OsmPbf.writeFull(ns, ws, Seq(
      OsmPbf.Relation(600L, Seq(1L, 2L), Seq("stop", "stop"), Seq(0, 0),
        Map("type" -> "route")))))
    val e3 = intercept[Exception] {
      OsmPbf.routeFeatures(spark, dir.resolve("onlystops.osm.pbf").toString).collect()
    }
    assert(chainMessage(e3).contains("no way members"), chainMessage(e3))
    // single-way route (the most common wild form) and a CLOSED LOOP
    // (circular line): both must terminate and keep their point chains
    val loopNs = Seq(
      OsmPbf.Node(1, 0L, 0L, Map.empty),
      OsmPbf.Node(2, 1000000000L, 0L, Map.empty),
      OsmPbf.Node(3, 1000000000L, 1000000000L, Map.empty))
    val loopWs = Seq(
      OsmPbf.Way(40, Seq(1L, 2L), Map.empty),
      OsmPbf.Way(41, Seq(2L, 3L), Map.empty),
      OsmPbf.Way(42, Seq(3L, 1L), Map.empty))
    Files.write(dir.resolve("loop.osm.pbf"), OsmPbf.writeFull(loopNs, loopWs, Seq(
      OsmPbf.Relation(700L, Seq(40L), Seq(""), Seq(1), Map("type" -> "route")),
      OsmPbf.Relation(701L, Seq(40L, 41L, 42L), Seq("", "", ""), Seq(1, 1, 1),
        Map("type" -> "route")))))
    val loops = OsmPbf.routeFeatures(spark, dir.resolve("loop.osm.pbf").toString)
      .collect().map(r => r.getAs[Long]("relation_id") -> r).toMap
    val single = loops(700L)
    assert(single.getAs[String]("kind") == "LINESTRING" &&
      single.getAs[Long]("n_chains") == 1L)
    val loop = loops(701L)
    assert(loop.getAs[String]("kind") == "LINESTRING" &&
      loop.getAs[Long]("n_chains") == 1L)
    val pts = graft.functions.Wkb.linePartsPoints(loop.getAs[Array[Byte]]("geom")).head
    assert(pts.length == 4 && pts.head == pts.last, s"loop did not close: $pts")
  }

  test("boundaries: empty role = outer, admin_centre node selected out, ring machinery intact") {
    val ns = Seq(
      OsmPbf.Node(1, 0L, 0L, Map.empty),
      OsmPbf.Node(2, 4000000000L, 0L, Map.empty),
      OsmPbf.Node(3, 4000000000L, 4000000000L, Map.empty),
      OsmPbf.Node(4, 0L, 4000000000L, Map.empty),
      OsmPbf.Node(9, 2000000000L, 2000000000L, Map.empty)) // admin centre
    val ws = Seq(OsmPbf.Way(10, Seq(1L, 2L, 3L, 4L, 1L), Map.empty))
    val dir = Files.createTempDirectory("osmpbf_bdry")
    // members: outer way (EMPTY role), admin_centre node, and a subarea
    // RELATION pointer (the France-style hierarchy) — the latter two are
    // annotations, selected out, never geometry
    Files.write(dir.resolve("b.osm.pbf"), OsmPbf.writeFull(ns, ws, Seq(
      OsmPbf.Relation(100L, Seq(10L, 9L, 101L),
        Seq("", "admin_centre", "subarea"), Seq(1, 0, 2),
        Map("type" -> "boundary", "boundary" -> "administrative")),
      OsmPbf.Relation(101L, Seq(10L), Seq("outer"), Seq(1),
        Map("type" -> "boundary", "boundary" -> "administrative")))))
    val rows = OsmPbf.boundaryFeatures(spark, dir.resolve("b.osm.pbf").toString)
      .collect().map(r => r.getAs[Long]("relation_id") -> r).toMap
    assert(rows.keySet == Set(100L, 101L), "subarea child must ALSO assemble standalone")
    val row = rows(100L)
    assert(row.getAs[String]("kind") == "POLYGON")
    assert(row.getAs[Long]("n_outer") == 1L && row.getAs[Long]("n_inner") == 0L)
    assert(math.abs(graft.functions.Wkb.area(row.getAs[Array[Byte]]("geom")) - 16.0) < 1e-9)
    // multipolygon assembly still refuses node members (no boundary leniency leak)
    Files.write(dir.resolve("mp.osm.pbf"), OsmPbf.writeFull(ns, ws, Seq(
      OsmPbf.Relation(200L, Seq(10L, 9L), Seq("outer", "admin_centre"), Seq(1, 0),
        Map("type" -> "multipolygon")))))
    val e = intercept[Exception] {
      OsmPbf.multipolygonFeatures(spark, dir.resolve("mp.osm.pbf").toString).collect()
    }
    assert(chainMessage(e).contains("type 0"), chainMessage(e))
  }

  test("relations roundtrip: packed roles_sid, zigzag-delta memids, member types") {
    val ns = nodes(8)
    val ws = Seq(OsmPbf.Way(1L, ns.take(4).map(_.id) :+ ns.head.id, Map.empty),
      OsmPbf.Way(2L, ns.drop(4).map(_.id) :+ ns(4).id, Map.empty))
    val rs = Seq(
      OsmPbf.Relation(100L, Seq(1L, 2L), Seq("outer", "inner"), Seq(1, 1),
        Map("type" -> "multipolygon", "landuse" -> "forest")),
      // descending memids force negative deltas through the zigzag leg;
      // a node member + empty role exercise the full enum/table range
      OsmPbf.Relation(101L, Seq(2L, 1L, ns.head.id), Seq("outer", "outer", ""),
        Seq(1, 1, 0), Map("type" -> "route")))
    val bytes = OsmPbf.writeFull(ns, ws, rs, blobsOf = 1) // every blob kind × both legs
    val (bn, bw, br) = OsmPbf.parseFull(bytes)
    assert(bn == ns && bw == ws && br == rs)
    // the narrower readers still refuse loudly
    assert(intercept[IllegalArgumentException] { OsmPbf.parse(bytes) }
      .getMessage.contains("ways"))
    assert(intercept[IllegalArgumentException] { OsmPbf.parseAll(bytes) }
      .getMessage.contains("relations"))
  }

  test("multipolygon assembly: hole assignment by containment, multiple outers, loud refusal arms") {
    import org.apache.spark.sql.functions.col
    def square(baseId: Long, cx: Long, cy: Long, h: Long): (Seq[OsmPbf.Node], Seq[Long]) = {
      val cs = Seq((cx - h, cy - h), (cx + h, cy - h), (cx + h, cy + h), (cx - h, cy + h))
      val nds = cs.zipWithIndex.map { case ((x, y), j) => OsmPbf.Node(baseId + j, x, y, Map.empty) }
      (nds, nds.map(_.id) :+ baseId)
    }
    val G = 1000000000L // 1 degree in nanodeg
    val (n1, r1) = square(10, 0, 0, 2 * G) // outer A at origin, half-size 2°
    val (n2, r2) = square(20, 0, 0, G / 2) // hole inside A
    val (n3, r3) = square(30, 10 * G, 0, G) // outer B at lon 10°
    val ns = n1 ++ n2 ++ n3
    val ws = Seq(OsmPbf.Way(1, r1, Map.empty), OsmPbf.Way(2, r2, Map.empty),
      OsmPbf.Way(3, r3, Map.empty))
    val rs = Seq(OsmPbf.Relation(500, Seq(1L, 2L, 3L), Seq("outer", "inner", "outer"),
      Seq(1, 1, 1), Map("type" -> "multipolygon")))
    val dir = Files.createTempDirectory("osmpbf_rel")
    Files.write(dir.resolve("mp.osm.pbf"), OsmPbf.writeFull(ns, ws, rs))
    val row = OsmPbf.multipolygonFeatures(spark, dir.resolve("mp.osm.pbf").toString)
      .collect().head
    assert(row.getLong(0) == 500 && row.getString(1) == "MULTIPOLYGON")
    assert(row.getLong(2) == 2 && row.getLong(3) == 1) // 2 outers, 1 inner
    val wkb = row.getAs[Array[Byte]](4)
    // the hole went to outer A, not B: area = (4° × 4° − 1° × 1°) + 2° × 2°
    assert(math.abs(graft.functions.Wkb.area(wkb) - (16.0 - 1.0 + 4.0)) < 1e-9)
    // loud arms: an inner inside NO outer; a node member; an open ring
    val orphanHole = Seq(OsmPbf.Relation(501, Seq(1L, 2L), Seq("outer", "inner"),
      Seq(1, 1), Map("type" -> "multipolygon")))
    val (n4, r4) = square(40, 50 * G, 0, G / 2) // hole 50° away from its outer
    Files.write(dir.resolve("orphan.osm.pbf"), OsmPbf.writeFull(n1 ++ n4,
      Seq(OsmPbf.Way(1, r1, Map.empty), OsmPbf.Way(2, r4, Map.empty)), orphanHole))
    val e1 = intercept[Exception] {
      OsmPbf.multipolygonFeatures(spark, dir.resolve("orphan.osm.pbf").toString).collect()
    }
    assert(Seq(e1.getMessage, String.valueOf(Option(e1.getCause).map(_.getMessage).orNull))
      .exists(m => m != null && m.contains("inside no outer ring")))
    val openRing = Seq(OsmPbf.Relation(502, Seq(4L), Seq("outer"), Seq(1),
      Map("type" -> "multipolygon")))
    Files.write(dir.resolve("open.osm.pbf"), OsmPbf.writeFull(n1,
      Seq(OsmPbf.Way(4, n1.map(_.id), Map.empty)), openRing)) // unclosed
    val e2 = intercept[Exception] {
      OsmPbf.multipolygonFeatures(spark, dir.resolve("open.osm.pbf").toString).collect()
    }
    assert(Seq(e2.getMessage, String.valueOf(Option(e2.getCause).map(_.getMessage).orNull))
      .exists(m => m != null && m.contains("unstitchable")))
    // non-multipolygon relations are SELECTED OUT, not errors
    val route = Seq(OsmPbf.Relation(503, Seq(1L), Seq("outer"), Seq(1),
      Map("type" -> "route")))
    Files.write(dir.resolve("route.osm.pbf"), OsmPbf.writeFull(n1,
      Seq(OsmPbf.Way(1, r1, Map.empty)), route))
    assert(OsmPbf.multipolygonFeatures(spark,
      dir.resolve("route.osm.pbf").toString).count() == 0)
    assert(OsmPbf.readRelations(spark,
      dir.resolve("route.osm.pbf").toString).count() == 1)
  }

  test("way stitching: rings split across open ways chain deterministically, reversal included") {
    import org.apache.spark.sql.functions.col
    val G = 1000000000L
    // outer square split into THREE open ways, one deliberately reversed;
    // hole split into two
    val c = Seq((0L, 0L), (2 * G, 0L), (2 * G, 2 * G), (0L, 2 * G))
    val h = Seq((G / 2, G / 2), (G, G / 2), (G, G), (G / 2, G))
    val ns = (c ++ h).zipWithIndex.map { case ((x, y), j) =>
      OsmPbf.Node(j + 1, x, y, Map.empty) }
    val ws = Seq(
      OsmPbf.Way(1, Seq(1L, 2L), Map.empty), // c0→c1
      OsmPbf.Way(2, Seq(3L, 2L), Map.empty), // c2→c1 (REVERSED segment)
      OsmPbf.Way(3, Seq(3L, 4L, 1L), Map.empty), // c2→c3→c0 closes
      OsmPbf.Way(4, Seq(5L, 6L, 7L), Map.empty), // hole half
      OsmPbf.Way(5, Seq(7L, 8L, 5L), Map.empty)) // hole half closes
    val rs = Seq(OsmPbf.Relation(600, Seq(1L, 2L, 3L, 4L, 5L),
      Seq("outer", "outer", "outer", "inner", "inner"), Seq(1, 1, 1, 1, 1),
      Map("type" -> "multipolygon")))
    val dir = Files.createTempDirectory("osmpbf_stitch")
    Files.write(dir.resolve("st.osm.pbf"), OsmPbf.writeFull(ns, ws, rs))
    val row = OsmPbf.multipolygonFeatures(spark, dir.resolve("st.osm.pbf").toString)
      .collect().head
    assert(row.getString(1) == "POLYGON")
    assert(row.getLong(2) == 1 && row.getLong(3) == 1, "expected 1 stitched outer + 1 inner RING")
    val wkb = row.getAs[Array[Byte]](4)
    // 2°×2° square minus a 0.5°×0.5° hole
    assert(math.abs(graft.functions.Wkb.area(wkb) - (4.0 - 0.25)) < 1e-9)
    assert(graft.functions.Wkb.numRings(wkb) == 2)
  }

  test("relations refusal is still loud in every mode (the subset mandate survives ways support)") {
    // hand-frame a PrimitiveBlock whose group carries field 4 (relations)
    val ns = nodes(2)
    val withWays = OsmPbf.writeAll(ns, Seq(OsmPbf.Way(1, Seq(ns.head.id), Map.empty)))
    // synthetic PrimitiveBlock:
    //   field 1 (stringtable, len 2) = { field 1 len 0 = "" }
    //   field 2 (group, len 2)       = { field 4 (relation) len 0 }
    val blockWithRelations =
      Array[Byte](0x0a, 0x02, 0x0a, 0x00, 0x12, 0x02, 0x22, 0x00)
    // route through the public seam: a full file whose OSMData body is the
    // synthetic block (raw blob)
    def frameFile(body: Array[Byte]): Array[Byte] = {
      val blob = scala.collection.mutable.ArrayBuffer[Byte]()
      blob += 0x10.toByte; blob += body.length.toByte // raw_size varint (field 2)
      blob += 0x0a.toByte; blob += body.length.toByte; blob ++= body // raw (field 1)
      val hdr = scala.collection.mutable.ArrayBuffer[Byte]()
      val kind = "OSMData".getBytes("UTF-8")
      hdr += 0x0a.toByte; hdr += kind.length.toByte; hdr ++= kind
      hdr += 0x18.toByte; hdr += blob.length.toByte // datasize (field 3)
      java.nio.ByteBuffer.allocate(4).putInt(hdr.length).array() ++ hdr ++ blob
    }
    val e1 = intercept[IllegalArgumentException] { OsmPbf.parse(frameFile(blockWithRelations)) }
    assert(e1.getMessage.contains("relations"))
    val e2 = intercept[IllegalArgumentException] { OsmPbf.parseAll(frameFile(blockWithRelations)) }
    assert(e2.getMessage.contains("relations"))
    // and the mixed nodes+ways file parses fine in way-aware mode
    assert(OsmPbf.parseAll(withWays)._2.length == 1)
  }

  test("spec mandates are enforced loudly: unknown required feature, ways, unsupported compression") {
    val ns = nodes(4)
    val good = OsmPbf.write(ns)
    // corrupt the required_features string "DenseNodes" → "DenseNodez":
    // a reader must refuse features it does not implement
    val idx = good.indexOfSlice("DenseNodes".getBytes("UTF-8"))
    assert(idx > 0)
    val bad = good.clone()
    bad(idx + 9) = 'z'.toByte
    val e = intercept[IllegalArgumentException] { OsmPbf.parse(bad) }
    assert(e.getMessage.contains("unsupported feature"))
    // truncated file: loud, not silent-partial
    intercept[IllegalArgumentException] { OsmPbf.parse(good.dropRight(3)) }
    // tag walk sanity: empty-tag nodes and tagged nodes interleave (the
    // keys_vals 0-terminator discipline) — already covered by roundtrip,
    // pin it explicitly
    val parsed = OsmPbf.parse(good)
    assert(parsed.count(_.tags.isEmpty) == 2 && parsed.count(_.tags.nonEmpty) == 2)
  }
}

package graft.sources

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.Wkb
import Kml.{KLine, KMulti, KPoint, KPolygon}

class FlatGeobufSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  test("writeFgb → parse roundtrips points and properties exactly (IEEE doubles)") {
    val feats = Seq(
      (Map("fid" -> "p1", "ETYPE" -> "view"), KPoint(11.5, 48.1)),
      (Map("fid" -> "p2", "ETYPE" -> "click"), KPoint(-180.0, -90.0)),
      (Map("fid" -> "p3", "ETYPE" -> "buy"), KPoint(1e-300, 2.5)))
    val (layer, out) = FlatGeobuf.parse(FlatGeobuf.writeFgb("events", feats))
    assert(layer == "events")
    assert(out.length == 3)
    out.zip(feats).foreach { case (f, (props, KPoint(x, y))) =>
      assert(f.props == props)
      assert(Wkb.geomType(f.geomWkb) == "POINT")
      assert(Wkb.bbox(f.geomWkb) == Wkb.BBox(x, y, x, y), s"coords not bit-exact for ${props("fid")}")
    }
  }

  test("line, polygon with hole (ends vector), multipoint, multipolygon roundtrip") {
    val line = KLine(Seq((0.0, 0.0), (3.0, 4.0), (5.5, 4.0)))
    val poly = KPolygon(Seq(
      Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)),
      Seq((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0))))
    val mpoint = KMulti(Seq(KPoint(1.0, 2.0), KPoint(3.0, 4.0)))
    val mpoly = KMulti(Seq(
      KPolygon(Seq(Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)))),
      KPolygon(Seq(Seq((5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 5.0))))))
    val (_, out) = FlatGeobuf.parse(FlatGeobuf.writeFgb("g", Seq(
      (Map.empty[String, String], line), (Map.empty[String, String], poly),
      (Map.empty[String, String], mpoint), (Map.empty[String, String], mpoly))))
    assert(Wkb.geomType(out(0).geomWkb) == "LINESTRING")
    val pw = out(1).geomWkb
    assert(Wkb.geomType(pw) == "POLYGON")
    assert(Wkb.ringVertexCounts(pw) == Seq(5, 5), "interior ring lost through ends")
    assert(!Wkb.containsPoint(pw, 3.0, 3.0) && Wkb.containsPoint(pw, 7.0, 7.0))
    assert(Wkb.geomType(out(2).geomWkb) == "MULTIPOINT")
    assert(Wkb.geomType(out(3).geomWkb) == "MULTIPOLYGON")
    assert(math.abs(Wkb.area(out(3).geomWkb) - 1.0) < 1e-12) // 0.5 + 0.5
  }

  test("z vector (spec field 2) carries: per-vertex elevations become Z WKB; 2D stays byte-identical") {
    def tw(wkb: Array[Byte]): Int =
      java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(1)
    val feats = Seq(
      (Map("fid" -> "pz"), KPoint(1.5, 2.5): Kml.KGeom),
      (Map("fid" -> "lz"), KLine(Seq((0.0, 0.0), (1.0, 1.0))): Kml.KGeom),
      (Map("fid" -> "p2"), KPoint(7.0, 8.0): Kml.KGeom))
    // per-feature z rows: point 1 ordinate, line 2, third feature 2D
    val (_, out) = FlatGeobuf.parse(FlatGeobuf.writeFgb("g", feats,
      zs = Seq(Seq(100.25), Seq(5.0, 6.0), Nil)))
    assert(tw(out(0).geomWkb) == 1001, tw(out(0).geomWkb))
    assert(Wkb.bbox(out(0).geomWkb) == Wkb.BBox(1.5, 2.5, 1.5, 2.5))
    assert(tw(out(1).geomWkb) == 1002 && Wkb.length(out(1).geomWkb) == math.sqrt(2.0))
    assert(tw(out(2).geomWkb) == 1, "2D feature must stay plain")
    // polygon with a hole: z spans ALL ring vertices through the ends cuts
    val poly = KPolygon(Seq(
      Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 0.0)),
      Seq((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 2.0))))
    val (_, out2) = FlatGeobuf.parse(FlatGeobuf.writeFgb("g",
      Seq((Map.empty[String, String], poly)),
      zs = Seq(Seq.fill(8)(3.0))))
    assert(tw(out2(0).geomWkb) == 1003)
    assert(Wkb.ringVertexCounts(out2(0).geomWkb) == Seq(4, 4))
    // mismatched z length refuses loudly at write
    val e = intercept[IllegalArgumentException] {
      FlatGeobuf.writeFgb("g", feats.take(1), zs = Seq(Seq(1.0, 2.0)))
    }
    assert(e.getMessage.contains("z ordinates"), e.getMessage)
  }

  test("indexed file (packed Hilbert R-tree): sequential parse skips the tree; content equals the unindexed twin") {
    val feats = (0 until 137).map { i =>
      (Map("fid" -> s"f$i"), KPoint(i % 17 * 3.5 - 20.0, i / 17 * 2.25 - 10.0))
    }
    val plain = FlatGeobuf.parse(FlatGeobuf.writeFgb("g", feats))._2
    // node size 4 forces a ≥4-level tree over 137 items — deep descent, runs
    val indexed = FlatGeobuf.parse(FlatGeobuf.writeFgb("g", feats, indexNodeSize = 4))._2
    def key(f: FlatGeobuf.FgbFeature) = (f.props("fid"), Wkb.bbox(f.geomWkb).toString)
    // Hilbert sort reorders features; the CONTENT must be identical
    assert(indexed.map(key).sorted == plain.map(key).sorted)
    assert(indexed.length == 137)
  }

  test("searchBbox: tree walk returns exactly the brute-force window subset and prunes decode work") {
    val feats = (0 until 200).map { i =>
      (Map("fid" -> s"f$i"), KPoint(i % 20 * 1.0, i / 20 * 1.0))
    }
    val bytes = FlatGeobuf.writeFgb("g", feats, indexNodeSize = 16)
    val (total, hits) = FlatGeobuf.searchBbox(bytes, 3.5, 2.5, 8.5, 6.5)
    assert(total == 200)
    val expect = feats.collect {
      case (p, KPoint(x, y)) if x >= 3.5 && x <= 8.5 && y >= 2.5 && y <= 6.5 => p("fid")
    }.toSet
    assert(hits.map(_.props("fid")).toSet == expect)
    // the pruning pin: a selective window must decode FEWER than total
    assert(hits.length < total && hits.nonEmpty,
      s"expected a pruned subset, got ${hits.length}/$total")
    // degenerate windows: empty hit set, full-extent window = everything
    assert(FlatGeobuf.searchBbox(bytes, 500.0, 500.0, 600.0, 600.0)._2.isEmpty)
    assert(FlatGeobuf.searchBbox(bytes, -1e9, -1e9, 1e9, 1e9)._2.length == 200)
  }

  test("searchBbox on an unindexed file refuses loudly; indexed file without a feature count refuses loudly") {
    val plain = FlatGeobuf.writeFgb("g", Seq((Map("fid" -> "x"), KPoint(1.0, 1.0))))
    val e = intercept[IllegalArgumentException] {
      FlatGeobuf.searchBbox(plain, 0, 0, 2, 2)
    }
    assert(e.getMessage.contains("no index"))
    val e2 = intercept[IllegalArgumentException] {
      FlatGeobuf.writeFgb("g", Seq.empty, indexNodeSize = 16)
    }
    assert(e2.getMessage.contains("empty layer"))
  }

  test("readBboxRanged: byte-ranged reads equal the in-memory tree walk, multi-file, empty window, loud on unindexed") {
    import spark.implicits._
    val feats = (0 until 260).map { i =>
      (Map("fid" -> s"f$i", "T" -> s"t${i % 3}"), KPoint(i % 26 * 1.0, i / 26 * 1.0))
    }
    val dir = Files.createTempDirectory("fgb_ranged")
    Files.write(dir.resolve("a.fgb"), FlatGeobuf.writeFgb("g", feats.take(130), indexNodeSize = 16))
    Files.write(dir.resolve("b.fgb"), FlatGeobuf.writeFgb("g", feats.drop(130), indexNodeSize = 4))
    def collectIds(df: org.apache.spark.sql.DataFrame) =
      df.select($"feature_id", $"props"("T").as("t")).as[(String, String)]
        .collect().sorted.toSeq
    val ranged = collectIds(FlatGeobuf.readBboxRanged(spark,
      dir.toString + "/*.fgb", "g", "fid", 4.0, 1.0, 11.0, 6.0))
    val inMem = collectIds(FlatGeobuf.readBbox(spark,
      dir.toString + "/*.fgb", "g", "fid", 4.0, 1.0, 11.0, 6.0))
    assert(ranged == inMem && ranged.nonEmpty, s"ranged=${ranged.length} inMem=${inMem.length}")
    // empty window → empty frame, same schema
    assert(FlatGeobuf.readBboxRanged(spark, dir.toString + "/*.fgb", "g", "fid",
      900.0, 900.0, 901.0, 901.0).count() == 0)
    // unindexed file in the glob → loud at INDEX time (driver), not mid-task
    Files.write(dir.resolve("plain.fgb"),
      FlatGeobuf.writeFgb("g", Seq((Map("fid" -> "x"), KPoint(1.0, 1.0)))))
    val e = intercept[IllegalArgumentException] {
      FlatGeobuf.readBboxRanged(spark, dir.toString + "/*.fgb", "g", "fid",
        0.0, 0.0, 2.0, 2.0)
    }
    assert(e.getMessage.contains("declares no index"))
  }

  test("deep tree: 20k features at node size 8 (~5 levels) — ranged == in-memory == brute force") {
    import spark.implicits._
    // non-grid coordinates (hash-scattered) so Hilbert reordering is
    // non-trivial and leaf runs interleave across the window
    def xy(i: Int): (Double, Double) = {
      val h = (i * 2654435761L) & 0xffffffffL
      ((h % 1000L) * 0.37, ((h >> 10) % 1000L) * 0.53)
    }
    val feats = (0 until 20000).map { i =>
      val (x, y) = xy(i)
      (Map("fid" -> s"f$i"), KPoint(x, y))
    }
    val dir = Files.createTempDirectory("fgb_deep")
    Files.write(dir.resolve("d.fgb"), FlatGeobuf.writeFgb("g", feats, indexNodeSize = 8))
    val bytes = Files.readAllBytes(dir.resolve("d.fgb"))
    val win = (100.0, 200.0, 160.0, 280.0) // ~2-3% of the extent
    val want = feats.collect {
      case (p, KPoint(x, y)) if x >= win._1 && x <= win._3 &&
        y >= win._2 && y <= win._4 => p("fid")
    }.sorted
    val (total, hits) = FlatGeobuf.searchBbox(bytes, win._1, win._2, win._3, win._4)
    assert(total == 20000)
    assert(hits.map(_.props("fid")).sorted == want && want.nonEmpty,
      s"in-memory walk: ${hits.length} vs brute ${want.length}")
    val ranged = FlatGeobuf.readBboxRanged(spark, dir.toString + "/d.fgb",
        "g", "fid", win._1, win._2, win._3, win._4)
      .select($"feature_id").as[String].collect().sorted.toSeq
    assert(ranged == want, s"ranged: ${ranged.length} vs brute ${want.length}")
  }

  test("readBbox: distributed index-pruned scan equals read + filter") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val feats = (0 until 300).map { i =>
      (Map("fid" -> s"f$i"), KPoint(i % 30 * 1.0, i / 30 * 1.0))
    }
    val dir = Files.createTempDirectory("fgb_bbox")
    Files.write(dir.resolve("a.fgb"), FlatGeobuf.writeFgb("g", feats.take(150), indexNodeSize = 16))
    Files.write(dir.resolve("b.fgb"), FlatGeobuf.writeFgb("g", feats.drop(150), indexNodeSize = 16))
    val pruned = FlatGeobuf.readBbox(spark, dir.toString + "/*.fgb", "g", "fid",
        5.0, 2.0, 12.0, 7.0)
      .select($"feature_id").as[String].collect().sorted.toSeq
    val xyUdf = udf { (b: Array[Byte]) =>
      val bb = Wkb.bbox(b); (bb.xmin, bb.ymin)
    }
    val full = FlatGeobuf.read(spark, dir.toString + "/*.fgb", "g", "fid")
      .select($"feature_id", xyUdf($"geom_wkb").as("xy"))
      .filter($"xy._1" >= 5.0 && $"xy._1" <= 12.0 &&
        $"xy._2" >= 2.0 && $"xy._2" <= 7.0)
      .select($"feature_id").as[String].collect().sorted.toSeq
    assert(pruned == full && pruned.nonEmpty)
  }

  test("magic mismatch is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      FlatGeobuf.parse("not a flatgeobuf file at all".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("magic"))
  }

  test("column schema is shared and key-sorted; features with missing props parse") {
    val feats = Seq(
      (Map("b" -> "1", "a" -> "2"), KPoint(0.0, 0.0)),
      (Map("a" -> "3"), KPoint(1.0, 1.0)),
      (Map.empty[String, String], KPoint(2.0, 2.0)))
    val (_, out) = FlatGeobuf.parse(FlatGeobuf.writeFgb("g", feats))
    assert(out(0).props == Map("a" -> "2", "b" -> "1"))
    assert(out(1).props == Map("a" -> "3"))
    assert(out(2).props.isEmpty)
  }

  test("read: FGB file becomes canonical feature envelopes") {
    val dir = Files.createTempDirectory("fgb").toString
    val bytes = FlatGeobuf.writeFgb("poi", Seq(
      (Map("fid" -> "m1", "NAME" -> "munich"), KPoint(11.5, 48.1)),
      (Map("fid" -> "md1", "NAME" -> "madrid"), KPoint(-3.5, 40.4))))
    Files.write(java.nio.file.Paths.get(s"$dir/cities.fgb"), bytes)
    val rows = FlatGeobuf.read(spark, s"$dir/cities.fgb", "poi", "fid",
      eventTsUs = 1000000L).collect()
    assert(rows.length == 2)
    val m = rows.find(_.getAs[String]("feature_id") == "m1").get
    assert(Wkb.bbox(m.getAs[Array[Byte]]("geom_wkb")) == Wkb.BBox(11.5, 48.1, 11.5, 48.1))
    assert(m.getAs[Map[String, String]]("props") == Map("fid" -> "m1", "NAME" -> "munich"))
    assert(m.getAs[java.sql.Timestamp]("event_ts").getTime == 1000L)
    assert(m.getAs[String]("source").endsWith("cities.fgb"))
  }
}

/** Generative roundtrip properties for the hand-built flatbuffers codec —
  * random geometries, coordinates (incl. negative/tiny/huge doubles), and
  * property maps must survive write → parse bit-for-bit.
  */
object FlatGeobufProps extends Properties("FlatGeobuf") {
  private val coord = Gen.oneOf(
    Gen.chooseNum(-180.0, 180.0), Gen.oneOf(0.0, -0.0, 1e-300, 1e300, -273.15))
  private val pt = Gen.zip(coord, coord)
  private val line = Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, pt))
    .map(ps => KLine(ps))
  private val ring = Gen.chooseNum(3, 6).flatMap(n => Gen.listOfN(n, pt))
    .map(ps => ps :+ ps.head)
  private val poly = Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, ring))
    .map(rs => KPolygon(rs))
  private val geom: Gen[Kml.KGeom] = Gen.oneOf(
    pt.map { case (x, y) => KPoint(x, y) }, line, poly,
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, pt))
      .map(ps => KMulti(ps.map { case (x, y) => KPoint(x, y) })))
  private val props = Gen.mapOf(Gen.zip(
    Gen.identifier.map(_.take(8)), Gen.alphaNumStr.map(_.take(12))))

  property("write → parse roundtrips geometry bytes and props exactly") =
    Prop.forAll(Gen.chooseNum(0, 5).flatMap(n =>
      Gen.listOfN(n, Gen.zip(props, geom)))) { feats =>
      val (_, out) = FlatGeobuf.parse(FlatGeobuf.writeFgb("t", feats))
      out.length == feats.length && out.zip(feats).forall { case (f, (p, g)) =>
        val expected = g match {
          case KPoint(x, y) => Wkb.point(x, y)
          case KLine(ps) => Wkb.lineString(ps)
          case KPolygon(rs) => Wkb.polygon(rs)
          case KMulti(ms) =>
            Wkb.multi(4, ms.map { case KPoint(x, y) => Wkb.point(x, y)
              case other => sys.error(s"unexpected $other") })
        }
        f.props == p && java.util.Arrays.equals(f.geomWkb, expected)
      }
    }
}

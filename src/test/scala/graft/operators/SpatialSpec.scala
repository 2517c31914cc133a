package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.Wkb

/** Grid-blocked point-in-polygon join semantics (SURVEY.md §2 A11d). */
class SpatialSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  private def square(x0: Double, y0: Double, x1: Double, y1: Double): Array[Byte] =
    Wkb.polygon(Seq(Seq((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0))))

  test("pointInPolygonJoin: exact matches, multi-match, no duplicates, cross-cell polygons") {
    import spark.implicits._
    // polygons: two overlapping squares plus one far away; cell=10 means
    // the 25-wide square spans multiple cells (replication path)
    val polys = Seq(
      (1, square(0, 0, 25, 25)),     // spans cells (0..2)×(0..2)
      (2, square(20, 20, 30, 30)),   // overlaps poly 1 in [20,25]²
      (3, square(100, 100, 101, 101))
    ).toDF("poly_id", "wkb")
    val points = Seq(
      ("a", 5.0, 5.0),     // poly 1 only
      ("b", 22.0, 22.0),   // polys 1 and 2 (overlap region)
      ("c", 28.0, 28.0),   // poly 2 only
      ("d", 50.0, 50.0),   // none
      ("e", 100.5, 100.5)  // poly 3 (different grid neighborhood)
    ).toDF("point_id", "px", "py")
    val got = Spatial.pointInPolygonJoin(points, polys, cell = 10.0)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got.distinct.length == got.length, s"duplicate pairs emitted: $got")
    assert(got.toSet == Set(("a", 1), ("b", 1), ("b", 2), ("c", 2), ("e", 3)), got.toSet)
  }

  test("polygonJoin: exactly-once emission for pairs colliding in many cells") {
    import spark.implicits._
    // both squares span many cells (cell=5) and overlap across several of
    // them — the canonical-cell rule must still emit the pair exactly once
    val a = Seq((1, square(0, 0, 22, 22)), (2, square(100, 100, 110, 110)))
      .toDF("a_id", "a_wkb")
    val b = Seq(
      (10, square(10, 10, 40, 40)),   // overlaps a=1 over a 12x12 region
      (20, square(21, 0, 30, 5)),     // thin overlap with a=1's right edge
      (30, square(60, 60, 70, 70))    // disjoint from both
    ).toDF("b_id", "b_wkb")
    val got = Spatial.polygonJoin(a, b, cell = 5.0)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got.distinct.length == got.length, s"duplicate pairs: $got")
    assert(got.toSet == Set((1, 10), (1, 20)), got.toSet)
  }

  test("polygonJoin: containment pair (no boundary crossing) found once") {
    import spark.implicits._
    val a = Seq((1, square(0, 0, 40, 40))).toDF("a_id", "a_wkb")
    val b = Seq((2, square(10, 10, 12, 12))).toDF("b_id", "b_wkb")
    val got = Spatial.polygonJoin(a, b, cell = 8.0)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got == Seq((1, 2)), got)
  }

  test("GeoSql: geom_* functions callable from SQL") {
    import spark.implicits._
    graft.functions.GeoSql.register(spark)
    Seq((1, square(0, 0, 10, 10)), (2, square(20, 20, 22, 22)))
      .toDF("id", "wkb").createOrReplaceTempView("geoms")
    val r = spark.sql("""
      SELECT id, geom_type(wkb) AS t, geom_area(wkb) AS a,
             geom_contains_point(wkb, 5.0, 5.0) AS has5,
             geom_bbox_xmax(wkb) AS xmax
      FROM geoms ORDER BY id""").collect()
    assert(r(0).getString(1) == "POLYGON" && r(0).getDouble(2) == 100.0)
    assert(r(0).getBoolean(3) && !r(1).getBoolean(3))
    assert(r(1).getDouble(4) == 22.0)
    val isect = spark.sql("""
      SELECT geom_intersects(a.wkb, b.wkb) FROM geoms a JOIN geoms b
      ON a.id = 1 AND b.id = 2""").collect().head.getBoolean(0)
    assert(!isect)
    spark.catalog.dropTempView("geoms")
  }

  test("pointInPolygonJoin: holes excluded, negative-coordinate cells correct") {
    import spark.implicits._
    val holed = Wkb.polygon(Seq(
      Seq((-20.0, -20.0), (0.0, -20.0), (0.0, 0.0), (-20.0, 0.0), (-20.0, -20.0)),
      Seq((-12.0, -12.0), (-8.0, -12.0), (-8.0, -8.0), (-12.0, -8.0), (-12.0, -12.0))))
    val polys = Seq((7, holed)).toDF("poly_id", "wkb")
    val points = Seq(
      ("in_ring", -15.0, -15.0),
      ("in_hole", -10.0, -10.0),
      ("outside", 5.0, -10.0)
    ).toDF("point_id", "px", "py")
    val got = Spatial.pointInPolygonJoin(points, polys, cell = 10.0)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got == Set(("in_ring", 7)), got)
  }
}

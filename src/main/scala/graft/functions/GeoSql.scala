package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-callable registration of the [[Wkb]] geometry surface, so a SQL
  * user gets the PostGIS-flavored predicates the reference's habitat
  * implies [UPSTREAM-UNVERIFIED — empty checkout, SURVEY.md §0] without
  * touching the Scala API. Scalar UDFs over opaque WKB binaries — the
  * documented per-row-binary case where a UDF is the right call
  * (SURVEY.md §7.3); the heavy joins stay in `operators.Spatial`.
  */
object GeoSql {

  /** Registers geom_* functions on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("geom_type", (b: Array[Byte]) => Wkb.geomType(b))
    spark.udf.register("geom_area", (b: Array[Byte]) => Wkb.area(b))
    spark.udf.register("geom_bbox_xmin", (b: Array[Byte]) => Wkb.bbox(b).xmin)
    spark.udf.register("geom_bbox_ymin", (b: Array[Byte]) => Wkb.bbox(b).ymin)
    spark.udf.register("geom_bbox_xmax", (b: Array[Byte]) => Wkb.bbox(b).xmax)
    spark.udf.register("geom_bbox_ymax", (b: Array[Byte]) => Wkb.bbox(b).ymax)
    spark.udf.register("geom_contains_point",
      (b: Array[Byte], x: Double, y: Double) => Wkb.containsPoint(b, x, y))
    spark.udf.register("geom_intersects",
      (a: Array[Byte], b: Array[Byte]) => Wkb.intersects(a, b))
    spark.udf.register("geom_bbox_intersects",
      (b: Array[Byte], xmin: Double, ymin: Double, xmax: Double, ymax: Double) =>
        Wkb.bboxIntersects(b, xmin, ymin, xmax, ymax))
    spark.udf.register("geom_wkt", (b: Array[Byte]) => Wkb.toWkt(b))
    spark.udf.register("geom_from_wkt", (s: String) => Wkb.fromWkt(s))
    spark.udf.register("geom_geodist",
      (a: Array[Byte], b: Array[Byte]) => Wkb.geodesicDistance(a, b))
    spark.udf.register("geom_distance",
      (a: Array[Byte], b: Array[Byte]) => Wkb.pointDistance(a, b))
    spark.udf.register("geom_boundary_distance",
      (b: Array[Byte], x: Double, y: Double) => Wkb.boundaryDistance(b, x, y))
    spark.udf.register("geom_length", (b: Array[Byte]) => Wkb.length(b))
    spark.udf.register("geom_length3d", (b: Array[Byte]) => Wkb.length3d(b))
    spark.udf.register("geom_simplify",
      (b: Array[Byte], eps: Double) => Wkb.simplify(b, eps))
    spark.udf.register("geom_geojson", (b: Array[Byte]) => Wkb.toGeoJson(b))
    spark.udf.register("geom_srid", (b: Array[Byte]) => Wkb.srid(b))
    spark.udf.register("geom_set_srid", (b: Array[Byte], srid: Int) => Wkb.setSrid(b, srid))
    spark.udf.register("geom_reproject", (b: Array[Byte], srid: Int) => Wkb.reproject(b, srid))
    spark.udf.register("geom_make_valid", (b: Array[Byte]) => Wkb.makeValid(b)._1)
    // boolean overlay family (r17): pieces surface as array<binary> so SQL
    // can explode() them; union is one polygon-with-holes (or MULTI when
    // disjoint) by construction
    spark.udf.register("geom_intersection",
      (a: Array[Byte], b: Array[Byte]) => Wkb.intersectPolygons(a, b).toArray)
    spark.udf.register("geom_union",
      (a: Array[Byte], b: Array[Byte]) => Wkb.unionPolygons(a, b))
    spark.udf.register("geom_difference",
      (a: Array[Byte], b: Array[Byte]) => Wkb.differencePolygons(a, b).toArray)
    spark.udf.register("geom_sym_difference",
      (a: Array[Byte], b: Array[Byte]) => Wkb.symDifferencePolygons(a, b).toArray)
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Wkb

/** CSV-with-WKT-column source — the OGR "CSV driver + GEOM_POSSIBLE_NAMES"
  * interchange shape (SURVEY.md §2 A1 family): a plain delimited table
  * whose geometry rides in one WKT text column. Unlike the single-file
  * binary members of the A1 family (SHP/GPKG/KML/GML/FGB/GPX), CSV is
  * SPLITTABLE and spark-native on BOTH sides: the reader is one
  * distributed `spark.read.csv` scan (Spark's parser handles the quoting
  * WKT needs — polygon text contains commas), the writer one distributed
  * `df.write.csv` — no driver-side fixture collect, no row cap, the only
  * A1 format that scales past the fixture caps by construction.
  *
  * Geometry text goes through [[Wkb.fromWkt]]/[[Wkb.toWkt]] — the codec
  * pair `a11h_wkt_roundtrip` pins bit-exact on doubles — so a
  * write→read roundtrip reproduces the original WKB bytes.
  */
object WktCsv {

  private val fromWktUdf = udf { (w: String) =>
    if (w == null) null else Wkb.fromWkt(w)
  }
  private val toWktUdf = udf { (b: Array[Byte]) =>
    if (b == null) null else Wkb.toWkt(b)
  }

  /** Distributed CSV scan → canonical feature envelope. All non-id,
    * non-geometry columns land in `props` (string-typed, the CSV
    * contract).
    *
    * @param idCol     column used as feature_id
    * @param wktCol    column holding the WKT geometry text
    * @param eventTsUs event time stamped on every feature (files carry
    *                  none); caller-supplied for determinism
    */
  def read(spark: SparkSession, path: String, layer: String,
      idCol: String, wktCol: String, eventTsUs: Long = 0L): DataFrame = {
    val df = spark.read.option("header", "true").csv(path)
    val propCols = df.columns.filterNot(c => c == idCol || c == wktCol).toSeq
    val propMap: Column =
      if (propCols.isEmpty) map()
      else map(propCols.flatMap(c => Seq(lit(c), col(c))): _*)
    df.select(
      lit(layer).as("layer"),
      col(idCol).as("feature_id"),
      fromWktUdf(col(wktCol)).as("geom_wkb"),
      propMap.as("props"),
      timestamp_micros(lit(eventTsUs)).as("event_ts"),
      lit(path).as("source"),
      lit(1).as("fmt_version"))
  }

  /** Canonical envelope → header'd CSV with a WKT geometry column: one
    * column per requested prop key plus (feature_id, wkt). Distributed
    * write — Spark's CSV writer quotes fields containing delimiters, so
    * polygon WKT survives. `read(path, idCol = "feature_id",
    * wktCol = "wkt")` on the output reproduces feature_id, the prop
    * entries, and the exact geometry bytes.
    */
  def write(features: DataFrame, path: String, propKeys: Seq[String]): Unit = {
    val propCols = propKeys.map(k => element_at(col("props"), k).as(k))
    features
      .select(col("feature_id") +: toWktUdf(col("geom_wkb")).as("wkt") +: propCols: _*)
      .write.mode("overwrite").option("header", "true").csv(path)
  }
}

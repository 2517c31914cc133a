package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.Wkb
import Shapefile.{PointS, PolyLineS, PolygonS, Shape}

/** ScalaCheck roundtrips for the Shapefile codec pair: writer-emitted
  * `.shp`/`.dbf` bytes must parse back to the same geometry (via the WKB
  * bbox/type/point-count observables) and the same trimmed attributes —
  * over adversarial coordinates, part structures, and field contents.
  */
object ShpCodecSpec extends Properties("ShpCodec") {

  private val genCoord: Gen[Double] = Gen.oneOf(
    Gen.choose(-180.0, 180.0),
    Gen.choose(-1e-9, 1e-9),
    Gen.oneOf(0.0, -0.0, 1e300, -1e300))

  private val genPt: Gen[(Double, Double)] =
    for { x <- genCoord; y <- genCoord } yield (x, y)

  private val genPart: Gen[Seq[(Double, Double)]] =
    Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, genPt))

  private val genPoint: Gen[Shape] = genPt.map { case (x, y) => PointS(x, y) }
  private val genLine: Gen[Shape] =
    Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, genPart)).map(PolyLineS(_))
  private val genPoly: Gen[Shape] =
    Gen.choose(1, 3).flatMap { n =>
      Gen.listOfN(n, Gen.choose(4, 10).flatMap(m => Gen.listOfN(m, genPt)))
    }.map(rings => PolygonS(rings.map(r => r :+ r.head))) // closed rings

  private def bboxOf(s: Shape): Wkb.BBox = s match {
    case PointS(x, y) => Wkb.BBox(x, y, x, y)
    case PolyLineS(parts) =>
      val ps = parts.flatten
      Wkb.BBox(ps.map(_._1).min, ps.map(_._2).min, ps.map(_._1).max, ps.map(_._2).max)
    case PolygonS(rings) =>
      val ps = rings.flatten
      Wkb.BBox(ps.map(_._1).min, ps.map(_._2).min, ps.map(_._1).max, ps.map(_._2).max)
  }

  private def nPts(s: Shape): Int = s match {
    case _: PointS => 1
    case PolyLineS(parts) => parts.map(_.length).sum
    case PolygonS(rings) => rings.map(_.length).sum
  }

  // one shape TYPE per .shp file (the format's rule, asserted by writeShp)
  private val genShapes: Gen[Seq[Shape]] = Gen.oneOf(
    Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, genPoint)),
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, genLine)),
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, genPoly)))

  property("writeShp → parseShp preserves record order, bbox, and point count exactly") =
    Prop.forAllNoShrink(genShapes) { shapes =>
      val parsed = Shapefile.parseShp(Shapefile.writeShp(shapes))
      parsed.length == shapes.length &&
        parsed.map(_._1) == (1 to shapes.length) &&
        parsed.zip(shapes).forall { case ((_, wkb), s) =>
          // observables: bbox always; WKB type per shape; pointCount
          // only where Wkb supports it (single LINESTRINGs)
          val typeOk = s match {
            case _: PointS => Wkb.geomType(wkb) == "POINT"
            case PolyLineS(parts) => Wkb.geomType(wkb) ==
              (if (parts.length == 1) "LINESTRING" else "MULTILINESTRING")
            case _: PolygonS => Wkb.geomType(wkb) == "POLYGON"
          }
          val cntOk = s match {
            case PolyLineS(parts) if parts.length == 1 =>
              Wkb.pointCount(wkb) == nPts(s)
            case _ => true
          }
          Wkb.bbox(wkb) == bboxOf(s) && typeOk && cntOk
        }
    }

  private val genField: Gen[(String, Int)] = for {
    n <- Gen.choose(1, 10)
    name <- Gen.listOfN(n, Gen.alphaUpperChar).map(_.mkString)
    width <- Gen.choose(1, 24)
  } yield (name, width)

  property("writeDbf → parseDbf yields width-truncated trimmed values") =
    Prop.forAll(Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, genField)),
        Gen.choose(0, 30)) { (fieldsRaw, nRows) =>
      val fields = fieldsRaw.zipWithIndex.map { case ((n, w), i) => (s"$n$i".take(10), w) }
      val rows = (0 until nRows).map(r =>
        fields.map { case (_, w) => s"v${r}x".take(w) })
      val (names, got) = Shapefile.parseDbf(Shapefile.writeDbf(fields, rows))
      names == fields.map(_._1) && got == rows.map(_.map(_.trim))
    }
}

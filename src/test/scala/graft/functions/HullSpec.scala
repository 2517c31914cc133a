package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkFixture

class HullSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  private def pts(ps: (Long, Long)*): Array[Long] =
    ps.flatMap(p => Seq(p._1, p._2)).toArray

  test("square with interior and edge points: 4 strict vertices, exact area") {
    val h = Hull.hullOf(pts((0, 0), (10, 0), (10, 10), (0, 10),
      (5, 5), (3, 7), (5, 0), (10, 5))) // interior + on-edge points dropped
    assert(h.length == 8)
    assert(Hull.area2(h) == 200L) // 2 * 10 * 10
    // canonical: starts at lexicographic min, CCW
    assert(h.take(2).sameElements(Array(0L, 0L)))
    assert(h.sameElements(pts((0, 0), (10, 0), (10, 10), (0, 10))))
  }

  test("degenerate inputs: collinear, single, duplicate points") {
    val line = Hull.hullOf(pts((0, 0), (5, 5), (10, 10), (2, 2)))
    assert(line.sameElements(pts((0, 0), (10, 10))) && Hull.area2(line) == 0L)
    assert(Hull.hullOf(pts((3, 4))).sameElements(pts((3, 4))))
    assert(Hull.hullOf(pts((1, 1), (1, 1), (1, 1))).sameElements(pts((1, 1))))
    assert(Hull.hullOf(Array.emptyLongArray).isEmpty)
  }

  test("hull is a mergeable summary: hull(A ∪ B) == hull(hull(A) ∪ hull(B))") {
    val a = pts((0, 0), (4, 1), (2, 6), (1, 1))
    val b = pts((10, 0), (7, 7), (3, 3), (10, 10))
    val whole = Hull.hullOf(a ++ b)
    val merged = Hull.hullOf(Hull.hullOf(a) ++ Hull.hullOf(b))
    assert(whole.sameElements(merged))
  }

  test("distributed aggregate is partition-invariant and matches local") {
    import spark.implicits._
    // ring of 40 points around (500,500) plus 200 interior points
    val ring = (0 until 40).map { i =>
      val a = 2 * math.Pi * i / 40
      ((500 + math.round(400 * math.cos(a))), (500 + math.round(400 * math.sin(a))))
    }
    val interior = (0 until 200).map(i => ((300 + i * 2).toLong, (400 + i).toLong))
    val all = (ring.map(p => (p._1.toLong, p._2.toLong)) ++ interior)
    val local = Hull.hullOf(pts(all: _*))
    for (parts <- Seq(1, 4, 13)) {
      val got = all.toDF("x", "y").repartition(parts)
        .select(array($"x", $"y").as("xy"))
        .agg(Hull.hullAgg($"xy").as("h"))
        .select($"h.n_hull", $"h.area2", $"h.hull")
        .head()
      assert(got.getInt(0) == local.length / 2)
      assert(got.getLong(1) == Hull.area2(local))
      assert(got.getSeq[Long](2).toArray.sameElements(local), s"parts=$parts")
    }
  }
}

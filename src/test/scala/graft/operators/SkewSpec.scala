package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** [[Skew.saltedJoin]] — the one property that matters is OUTPUT EQUALITY
  * to the plain join (salting must be a pure physical rewrite), plus the
  * reason to use it at all: the hot key's rows actually scatter across
  * salts instead of funneling into one reducer.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.session

  test("saltedJoin: equals plain join on a skewed key, hot rows scatter over all salts") {
    import spark.implicits._
    // 5000 rows on one hot key, a handful elsewhere — the shape salting exists for
    val large = ((1 to 5000).map(i => (i.toLong, "hot")) ++
      (1 to 7).map(i => (10000L + i, s"cold$i")))
      .toDF("row_id", "k")
    val small = (Seq("hot") ++ (1 to 7).map(i => s"cold$i")).zipWithIndex
      .map { case (k, i) => (k, 100L + i) }.toDF("dk", "attr")
    val salted = Skew.saltedJoin(large, small, "k", "dk", salts = 8, scatterCol = "row_id")
      .select($"row_id", $"k", $"attr")
    val plain = large.join(small, $"k" === $"dk").select($"row_id", $"k", $"attr")
    assert(salted.count() == 5007)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the scatter is real: the hot key's 5000 rows hash onto every salt
    val spread = large.filter($"k" === "hot")
      .select(pmod(hash($"row_id"), lit(8)).as("salt"))
      .distinct().count()
    assert(spread == 8, s"hot key only reached $spread of 8 salts")
    // deterministic: same inputs, same result (hash salt, no RNG)
    val again = Skew.saltedJoin(large.repartition(11), small, "k", "dk",
      salts = 8, scatterCol = "row_id").select($"row_id", $"k", $"attr")
    assert(again.exceptAll(salted).isEmpty && salted.exceptAll(again).isEmpty)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §2 C7 / builder brief "salting for
  * skew"). AQE's OptimizeSkewedJoin handles sort-merge skew automatically;
  * explicit salting remains the tool when one join key dominates so hard
  * that even a split partition hot-spots, or when the small side must be
  * replicated deterministically (no RNG — replays and retries must land
  * rows on the same reducer).
  */
object Skew {

  /** Equi-join `large ⋈ small` where `large` is skewed on the join key:
    * scatter the large side over `salts` sub-keys using a deterministic
    * hash of `scatterCol` (a high-cardinality secondary column), and
    * replicate the small side once per salt. Result equals the plain
    * join; the hot key's rows spread over `salts` reducers instead of one.
    *
    * Cost model: small side inflates ×salts — use for genuinely small
    * dimension sides (the same precondition as a broadcast, but salting
    * also works when the small side exceeds the broadcast threshold).
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String,
      salts: Int, scatterCol: String): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLarge = large.withColumn("_graft_salt",
      pmod(hash(col(scatterCol)), lit(salts)))
    val replicatedSmall = small.withColumn("_graft_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(replicatedSmall,
        saltedLarge(largeKey) === replicatedSmall(smallKey)
          && saltedLarge("_graft_salt") === replicatedSmall("_graft_salt"))
      .drop("_graft_salt")
  }
}

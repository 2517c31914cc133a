package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single registry of every declared operator/query (VERDICT r1 item 3:
  * one definition site per operator; `queries` and `oracleSql` are derived
  * views so they can never drift apart).
  */
object Registry {
  val all: Seq[QuerySpec] =
    operators.TierA.specs ++ operators.TierB.specs ++ operators.TierC.specs ++
      operators.TierCText.specs ++ operators.TierCSim.specs ++
      operators.Multimodal.specs ++ operators.Spatial.specs

  require(all.map(_.name).distinct.size == all.size, "duplicate query names in registry")

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

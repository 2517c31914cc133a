package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graftbridge.DotProductFloat

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT graft_dot(a, b)")`
  * works next to the Column API (SURVEY.md §3 lifecycle entry 2).
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * programmatically via `withExtensions`. Kept deliberately small: the
  * engine's design rule is "built-in operators first, custom Expressions
  * only where measured" (SURVEY.md §7.3) — today that is the vector dot
  * product; new natives register here as they earn their place.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
  }
}

object GraftExtensions {
  private[graft] val dotFunction = (
    new FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProductFloat].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot(arrayFloat, arrayFloat) takes 2 arguments")
      DotProductFloat(children.head, children(1))
    })
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.graftbridge.{DotProductFloat, HilbertIndex}

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
    ext.injectFunction(GraftExtensions.mortonFunction)
    ext.injectFunction(GraftExtensions.hilbertFunction)
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

  /** `graft_hilbert(qx, qy)` — the order-16 Hilbert curve key
    * ([[HilbertIndex]]): unlike Morton this CANNOT be a composed built-in
    * tree (the 16-level rotation walk is stateful), so the native
    * expression registers directly.
    */
  private[graft] val hilbertFunction = (
    new FunctionIdentifier("graft_hilbert"),
    new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_hilbert(qx, qy) takes 2 arguments")
      HilbertIndex(children.head, children(1))
    })

  /** `graft_morton(qx, qy)` — the Z-order key as a composed tree of
    * built-in bitwise expressions (same magic-number spreading as
    * `Spatial.mortonCol`), NOT a UDF: the whole function inlines into
    * whole-stage codegen like any arithmetic.
    */
  private[graft] val mortonFunction = {
    import org.apache.spark.sql.catalyst.expressions.{
      BitwiseAnd, BitwiseOr, Literal, ShiftLeft}
    def band(a: Expression, m: Long): Expression = BitwiseAnd(a, Literal(m))
    def bor(a: Expression, b: Expression): Expression = BitwiseOr(a, b)
    def shl(a: Expression, n: Int): Expression = ShiftLeft(a, Literal(n))
    def spread16(v: Expression): Expression = {
      val m1 = band(bor(v, shl(v, 8)), 0x00FF00FFL)
      val m2 = band(bor(m1, shl(m1, 4)), 0x0F0F0F0FL)
      val m3 = band(bor(m2, shl(m2, 2)), 0x33333333L)
      band(bor(m3, shl(m3, 1)), 0x55555555L)
    }
    (new FunctionIdentifier("graft_morton"),
      new ExpressionInfo(classOf[BitwiseOr].getName, "graft_morton"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_morton(qx, qy) takes 2 arguments")
        bor(spread16(children.head), shl(spread16(children(1)), 1))
      })
  }
}

/** Lives under `org.apache.spark.sql` so it can use the `private[sql]`
  * pieces a native expression needs (`AbstractDataType` input-type
  * declarations, `ExpressionUtils` Column↔Expression bridging) — the same
  * namespace technique connector libraries use. Engine-facing API is
  * re-exported as `graft.functions.VectorExprs`.
  */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for the float-vector dot product (SURVEY.md
  * §4 "custom Expression" row; the hot scalar of C2/C3 similarity search).
  *
  * Why not a UDF: a Scala UDF receives `Seq[Float]`, which boxes every
  * element of both arrays on every call — at sf0.1 the kNN join evaluates
  * ~400k pairs × 128 floats of boxing, measured as the dominant cost of
  * the whole query. This expression reads `ArrayData.getFloat` directly
  * (zero allocation) and participates in whole-stage codegen, so the dot
  * product fuses into the join's generated loop.
  *
  * Determinism: strict left-to-right IEEE double accumulation — the exact
  * association the DuckDB oracle SQL replays term by term.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column-level dot product over two `array<float>` columns. */
  def dotF(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductFloat(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

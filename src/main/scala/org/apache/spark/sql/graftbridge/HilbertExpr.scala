/** Native Hilbert-curve index expression. Lives in the
  * `org.apache.spark.sql` namespace for the same `private[sql]` bridging
  * reason as [[VectorExprs]] (ExpectsInputTypes / ExpressionUtils).
  */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Order-16 Hilbert curve index: maps quantized 16-bit grid coordinates
  * (x, y) ∈ [0, 65536)² to the curve position d ∈ [0, 2³²) — the
  * locality-preserving alternative to the Morton key (`Spatial.mortonCol`)
  * for range-partitioned spatial layouts: consecutive d values are always
  * 4-adjacent grid cells (Morton jumps at every power-of-two boundary),
  * so a bbox maps to fewer, longer key ranges → fewer parquet row-group
  * seeks at 100 TB.
  *
  * Why a native expression and not unrolled Columns: the xy2d loop is
  * STATEFUL — each of the 16 levels rewrites (x, y, d) via a conditional
  * rotation that reads both previous coordinates multiple times, so an
  * unrolled Column tree multiplies per level (the 3^rounds plan-growth
  * family BENCH_NOTES documents for star-contraction); 16 levels would be
  * a ~4¹⁶-node tree. One expression node keeps the plan O(1) and the loop
  * lives in generated Java inside whole-stage codegen.
  *
  * Algorithm: the standard bottom-up xy2d walk (s = 2¹⁵ … 1): at each
  * level d += s²·((3·rx) xor ry), then rotate the lower quadrant —
  * integer-exact, so the DuckDB oracle replays it as 16 chained CTEs.
  * Inputs are masked to 16 bits defensively (out-of-range bits would
  * silently alias cells).
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a & 0xFFFFL;
         |long $y = $b & 0xFFFFL;
         |long $d = 0L;
         |for (long $s = 32768L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Driver-side reference walk (same loop the codegen emits). */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0 & 0xFFFFL
    var y = y0 & 0xFFFFL
    var d = 0L
    var s = 32768L
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse d2xy (driver-side): curve position → (qx, qy), the piece a
    * bbox planner uses to turn a key range back into grid cells —
    * symmetric to `Spatial.mortonDecode`.
    */
  def d2xy(d0: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = d0 & 0xFFFFFFFFL
    var s = 1L
    while (s < 65536L) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val tt = x; x = y; y = tt
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  def hilbertF(x: Column, y: Column): Column =
    ExpressionUtils.column(HilbertIndex(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))
}

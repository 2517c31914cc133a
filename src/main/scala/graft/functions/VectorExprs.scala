package graft.functions

import org.apache.spark.sql.Column

/** Engine-facing facade over the native vector expressions (implementation
  * in `org.apache.spark.sql.graftbridge` — see that file for why).
  */
object VectorExprs {
  /** Codegen'd left-fold dot product over two `array<float>` columns. */
  def dotF(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.VectorExprs.dotF(a, b)
}

package graft.functions

import org.apache.spark.sql.Column

/** Engine-facing facade over the native vector expressions (implementation
  * in `org.apache.spark.sql.graftbridge` — see that file for why).
  */
object VectorExprs {
  /** Codegen'd left-fold dot product over two `array<float>` columns. */
  def dotF(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.VectorExprs.dotF(a, b)

  /** IVF cell assignment: argmax cosine to a literal seed matrix, ties to
    * the lowest seed index — one codegen'd node replacing a per-seed dot
    * chain tree (planning/codegen blowup, measured on c3_ivfpq).
    */
  def nearestSeedF(emb: Column, n2: Column, seeds: Seq[(Seq[Float], Double)]): Column =
    org.apache.spark.sql.graftbridge.VectorExprs.nearestSeedF(emb, n2, seeds)

  /** Top-`nprobe` IVF cells by cosine descending — the multi-probe recall
    * knob; element 0 always equals [[nearestSeedF]].
    */
  def nearestSeedsF(emb: Column, n2: Column,
      seeds: Seq[(Seq[Float], Double)], nprobe: Int): Column =
    org.apache.spark.sql.graftbridge.VectorExprs.nearestSeedsF(emb, n2, seeds, nprobe)

  /** PQ ADC lookup table (squared-L2 to every code of one subspace book)
    * as a single `array<double>` node.
    */
  def pqDistsF(emb: Column, offset: Int, book: Seq[Seq[Float]]): Column =
    org.apache.spark.sql.graftbridge.VectorExprs.pqDistsF(emb, offset, book)

  /** PQ sub-code: argmin of [[pqDistsF]], ties to the lowest code. */
  def pqCodeF(emb: Column, offset: Int, book: Seq[Seq[Float]]): Column =
    org.apache.spark.sql.graftbridge.VectorExprs.pqCodeF(emb, offset, book)
}

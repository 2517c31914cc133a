package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.{CodebookF, SeedSetF}

/** Engine-facing facade over the native vector expressions (implementation
  * in `org.apache.spark.sql.graftbridge` — see that file for why).
  *
  * Codebook payloads are BROADCAST variables, not plan literals: broadcast
  * once per query ([[broadcastSeeds]]/[[broadcastBook]]), then hand the
  * handle to every expression that consults it — the plan node stays O(1)
  * as codebooks grow and the payload ships once per executor.
  */
object VectorExprs {
  /** Codegen'd left-fold dot product over two `array<float>` columns. */
  def dotF(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.VectorExprs.dotF(a, b)

  /** Broadcast an IVF seed set (row-major seeds + per-seed √‖seed‖²). */
  def broadcastSeeds(s: SparkSession, seeds: Seq[(Seq[Float], Double)]): SeedSetF =
    org.apache.spark.sql.graftbridge.VectorExprs.broadcastSeeds(s, seeds)

  /** Broadcast one subspace's PQ codebook. */
  def broadcastBook(s: SparkSession, book: Seq[Seq[Float]]): CodebookF =
    org.apache.spark.sql.graftbridge.VectorExprs.broadcastBook(s, book)

  /** IVF cell assignment: argmax cosine to a broadcast seed matrix, ties
    * to the lowest seed index — one codegen'd node replacing a per-seed
    * dot chain tree (planning/codegen blowup, measured on c3_ivfpq).
    */
  def nearestSeedF(emb: Column, n2: Column, seeds: SeedSetF): Column =
    org.apache.spark.sql.graftbridge.VectorExprs.nearestSeedF(emb, n2, seeds)

  /** Top-`nprobe` IVF cells by cosine descending — the multi-probe recall
    * knob; element 0 always equals [[nearestSeedF]].
    */
  def nearestSeedsF(emb: Column, n2: Column, seeds: SeedSetF,
      nprobe: Int): Column =
    org.apache.spark.sql.graftbridge.VectorExprs.nearestSeedsF(emb, n2, seeds, nprobe)

  /** PQ ADC lookup table (squared-L2 to every code of one subspace book)
    * as a single `array<double>` node.
    */
  def pqDistsF(emb: Column, offset: Int, book: CodebookF): Column =
    org.apache.spark.sql.graftbridge.VectorExprs.pqDistsF(emb, offset, book)

  /** PQ sub-code: argmin of [[pqDistsF]], ties to the lowest code. */
  def pqCodeF(emb: Column, offset: Int, book: CodebookF): Column =
    org.apache.spark.sql.graftbridge.VectorExprs.pqCodeF(emb, offset, book)
}

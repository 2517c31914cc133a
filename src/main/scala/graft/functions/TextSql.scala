package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL surface for the text-fingerprinting primitives — the
  * [[GeoSql.register]] / [[SketchSql.register]] pattern applied to the
  * dedup family, so `spark.sql` users can build the same near-dup
  * pipelines the Column/operator API runs:
  *
  *   graft_simhash(text)        → BIGINT   (64-bit SimHash of the
  *                                          lowercase whitespace tokens)
  *   graft_minhash(text)        → ARRAY<BIGINT>  (MinHash signature over
  *                                          3-token shingles)
  *   graft_minhash_bands(text)  → ARRAY<STRING>  (LSH band keys of that
  *                                          signature — GROUP BY one of
  *                                          these to bucket candidates)
  *   graft_winnow(text)         → ARRAY<BIGINT>  (MOSS winnowing
  *                                          fingerprints, k=8 / w=4)
  *   graft_deflate_len(text)    → BIGINT   (zlib-compressed length — the
  *                                          repetitiveness denominator)
  *
  * All five are deterministic pure functions of the string (md5-derived
  * hash families, no RNG, no session state), so results are identical
  * across executors, replays, and partitionings — the property every
  * declared query in this repo is built on. They are scalar UDFs by
  * necessity (per-row rolling hashes and bit-vote loops are not
  * expressible as codegen'd built-ins); keep them OUT of 100 TB hot
  * paths where a built-in composition exists, exactly as SURVEY §4
  * prescribes for the operator API.
  */
object TextSql {
  private def toks(text: String): Seq[String] =
    text.toLowerCase.split(" ").filter(_.nonEmpty).toSeq

  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_simhash",
      (text: String) => TextStats.simHash(toks(text)))
    spark.udf.register("graft_minhash",
      (text: String) => MinHash.signature(MinHash.shingles(toks(text))))
    spark.udf.register("graft_minhash_bands",
      (text: String) => MinHash.bandHashes(MinHash.signature(MinHash.shingles(toks(text)))))
    spark.udf.register("graft_winnow",
      (text: String) => TextStats.winnow(text))
    spark.udf.register("graft_deflate_len",
      (text: String) => TextStats.deflateLen(text))
  }
}

package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) fuzzy dedup — the character-level
  * complement to token-set similarity: catches OCR noise, typo
  * variants, and template fills that token Jaccard blurs and MinHash
  * under-weights on short texts.
  *
  * Levenshtein is O(len²) per comparison, so the operator NEVER runs
  * all-pairs: candidates are generated inside equi-join BLOCKS
  * (first token × text-length bucket) and the distance is computed on
  * a fixed-length prefix. At 100 TB the block key is the shuffle key;
  * block sizes are bounded by the key's selectivity (add more blocking
  * features — e.g. a SimHash band — to split hot blocks, exactly like
  * the LSH banding trade). Blocking is a RECALL trade: a pair whose
  * first token differs or whose lengths straddle a bucket boundary is
  * not compared — standard entity-resolution practice (the reference
  * point is Fellegi–Sunter-style blocking; see PAPERS.md).
  */
object FuzzyDedup {

  /** Near-dup pairs (id_a, id_b, dist) with prefix edit distance ≤
    * `maxDist`, blocked on (first whitespace token, length(text) div
    * `lenBucket`). `prefixLen` caps the DP cost per comparison. */
  def editDistancePairs(df: DataFrame, id: Column, text: Column,
                        maxDist: Int, prefixLen: Int = 40,
                        lenBucket: Int = 64): DataFrame = {
    val base = df.select(id.as("id"),
      substring(text, 1, prefixLen).as("pfx"),
      element_at(graft.text.TextAnalysis.tokens(text), 1).as("__tok1"),
      (length(text).cast("long") / lenBucket).cast("long").as("__lb"))
    base.select(col("id").as("id_a"), col("pfx").as("__pa"),
        col("__tok1"), col("__lb"))
      .join(base.select(col("id").as("id_b"), col("pfx").as("__pb"),
        col("__tok1"), col("__lb")), Seq("__tok1", "__lb"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("__pa"), col("__pb")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share any
  * word n-gram with a benchmark/eval set — the standard leakage check
  * run before training (e.g. the 13-gram overlap filters described in
  * the GPT-3 and PaLM dataset reports).
  *
  * 100 TB shape: the benchmark side is an eval set — megabytes, not
  * terabytes — so its distinct gram set is BROADCAST and the corpus
  * side never shuffles its text at all: grams are hashed to 60-bit
  * md5-prefix keys (15 hex chars, the repo convention for
  * membership-bearing hashes — 32 bits would produce false-positive
  * contamination hits at real corpus scale) in the scan projection,
  * the broadcast hash join filters them map-side, and only (doc_id, gram_hash) survivors reach
  * the one aggregation shuffle. For a benchmark too big to broadcast,
  * pass `broadcastBench = false` to fall back to a plain shuffled
  * equi-join on the same hashed keys.
  */
object Decontam {

  private def toks(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Explode a token array into its n-gram 60-bit hashes (md5-prefix,
    * cross-engine reproducible). Docs shorter than n emit nothing.
    *
    * The tokenization is materialized in its OWN projection before the
    * transform/explode: a higher-order-function lambda re-evaluates any
    * captured non-attribute expression per array element, so inlining
    * `split(...)` here would re-tokenize the document once per gram —
    * measured 10x slower on the 54-token corpus docs. */
  private def gramHashes(df: DataFrame, id: Seq[Column], tokens: Column,
                         n: Int): DataFrame = {
    val tk = col("__graft_toks")
    // guarded sequence: for docs shorter than n tokens, sequence(0, <0)
    // steps BACKWARDS and the i+1 slice start hits 0 (a runtime error).
    // The size >= n filter below is not protection enough — a Generate
    // above this projection makes InferFiltersFromGenerate add
    // size(grams) > 0 conjuncts whose codegen subexpression elimination
    // evaluates `grams` before the short-circuiting size filter.
    val grams = transform(
      when(size(tk) >= n, sequence(lit(0), size(tk) - n))
        .otherwise(array().cast("array<int>")),
      i => array_join(slice(tk, i + 1, lit(n)), " "))
    df.select(id :+ tokens.as("__graft_toks"): _*)
      .filter(size(tk) >= n)
      .select(id :+ explode(grams).as("gram"): _*)
      .select(id :+ conv(substring(md5(col("gram")), 1, 15), 16, 10)
        .cast("long").as("gram_h"): _*)
  }

  /** Per-document contamination report: (idCol, n_hit_grams) for every
    * corpus doc sharing at least one word n-gram with `bench`'s
    * `benchTextCol`. Clean docs are absent from the output. */
  def contaminationReport(docs: DataFrame, bench: DataFrame, n: Int,
                          idCol: String = "doc_id", textCol: String = "text",
                          benchTextCol: String = "text",
                          broadcastBench: Boolean = true): DataFrame = {
    val benchGrams = gramHashes(bench, Seq.empty, toks(col(benchTextCol)), n)
      .distinct()
    val rhs = if (broadcastBench) broadcast(benchGrams) else benchGrams
    gramHashes(docs, Seq(col(idCol)), toks(col(textCol)), n)
      .join(rhs, "gram_h")
      .groupBy(idCol)
      .agg(count_distinct(col("gram_h")).cast("long").as("n_hit_grams"))
  }

  /** Per-document contamination census: (idCol, n_grams, n_hit_grams,
    * hit_frac) for every corpus doc sharing at least one word n-gram
    * with the benchmark — the thresholded-removal primitive on top of
    * [[contaminationReport]]'s any-hit census (drop docs whose overlap
    * FRACTION exceeds a cut, not every doc with a single stray gram).
    * Grams are deduped per document BEFORE the explode (a per-row
    * `array_distinct`, no shuffle spent on within-doc repeats), so
    * repeats can't inflate either the denominator or the hit count;
    * docs shorter than n tokens have no grams and cannot be flagged.
    * Same 100 TB shape as the report: hashed grams, broadcast
    * benchmark, and the one aggregation shuffle carries only
    * contaminated grams plus each doc's census integers. */
  def contaminationCensus(docs: DataFrame, bench: DataFrame, n: Int,
                          idCol: String = "doc_id", textCol: String = "text",
                          benchTextCol: String = "text",
                          broadcastBench: Boolean = true): DataFrame = {
    val benchGrams = gramHashes(bench, Seq.empty, toks(col(benchTextCol)), n)
      .distinct()
    val rhs = if (broadcastBench) broadcast(benchGrams) else benchGrams
    val tk = col("__graft_toks")
    // guarded sequence — same InferFiltersFromGenerate/subexpr-hoist
    // hazard as gramHashes above: the size >= n filter alone cannot
    // keep this expression off short docs
    val gramArr = transform(
      when(size(tk) >= n, sequence(lit(0), size(tk) - n))
        .otherwise(array().cast("array<int>")),
      i => conv(substring(md5(array_join(slice(tk, i + 1, lit(n)), " ")), 1, 15),
        16, 10).cast("long"))
    docs.select(col(idCol), toks(col(textCol)).as("__graft_toks"))
      .filter(size(tk) >= n)
      .select(col(idCol), array_distinct(gramArr).as("__graft_grams"))
      .select(col(idCol), size(col("__graft_grams")).cast("long").as("n_grams"),
        explode(col("__graft_grams")).as("gram_h"))
      .join(rhs, "gram_h")
      .groupBy(idCol, "n_grams")
      .agg(count(lit(1)).cast("long").as("n_hit_grams"))
      .select(col(idCol), col("n_grams"), col("n_hit_grams"),
        round(col("n_hit_grams").cast("double") / col("n_grams").cast("double"), 6)
          .as("hit_frac"))
  }
}

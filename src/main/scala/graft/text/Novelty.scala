package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram novelty scoring — "how much of this document is new
  * information?" — the curation signal web-scale corpus builders use
  * alongside dedup (a doc can be 0% duplicate yet 95% boilerplate
  * n-grams the corpus already holds; conversely a re-crawl batch whose
  * novelty collapses is a signal to stop crawling that source). Two
  * views:
  *
  *  - [[firstOccurrenceNovelty]]: batch attribution — every distinct
  *    n-gram is credited to the document where it FIRST occurs
  *    (min doc_id: deterministic, replayable), and a doc's novelty is
  *    the fraction of its grams it introduced. The corpus-level sum of
  *    `n_first` is exactly the distinct-gram count, so the scores are
  *    also an exact decomposition of corpus vocabulary growth (the
  *    per-doc sibling of q109's growth curve).
  *  - [[ingestNovelty]]: incremental — a batch doc's novelty against
  *    the STANDING corpus only (the q156/q180/q191 batch-vs-corpus
  *    ingest discipline): fraction of its grams no stored doc
  *    contains.
  *
  * 100 TB shape: one shuffle keyed by gram builds the inverted index /
  * first-occurrence table (the same cost class as every shingle-dedup
  * op — at scale the gram→first table IS the stored index and the
  * incremental path joins the batch against it, never rescanning the
  * corpus); the credit join is an equi-join on gram that reuses that
  * partitioning; the roll-up is a map-side-combined groupBy on doc.
  * Nothing is ever all-pairs and nothing is driver-sized.
  */
object Novelty {

  /** Per-doc first-occurrence novelty over `items` (any array column —
    * shingles, tokens, hashes): (doc_id, n_grams, n_first,
    * novelty_micro = n_first·10⁶ div n_grams). Docs with empty item
    * arrays report n_grams = 0 and a null score; docs whose items
    * column is null report null n_grams (excluded, observable — the
    * q213 census discipline). */
  def firstOccurrenceNovelty(docs: DataFrame, id: Column,
                             items: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"), array_distinct(items).as("gs"))
    val inv = toks.select(col("doc_id"), explode(col("gs")).as("g"))
    val firsts = inv.groupBy("g").agg(min("doc_id").as("first_doc"))
    val nFirst = inv.join(firsts, "g")
      .filter(col("doc_id") === col("first_doc"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_first"))
    toks.select(col("doc_id"),
        when(col("gs").isNotNull, size(col("gs")).cast("long")).as("n_grams"))
      .join(nFirst, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_first"), lit(0L)).as("n_first"))
      .withColumn("novelty_micro",
        when(col("n_grams") > 0, expr("n_first * 1000000 div n_grams")))
  }

  /** Batch-vs-corpus novelty: for every row where `isBatch`, the share
    * of its grams NO standing (non-batch) document contains —
    * (doc_id, n_grams, n_new_grams, novelty_micro). The standing side
    * reduces to a distinct gram set (at scale: the stored gram index),
    * and the batch joins against it once. */
  def ingestNovelty(docs: DataFrame, id: Column, items: Column,
                    isBatch: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"), isBatch.as("is_new"),
      array_distinct(items).as("gs"))
    val inv = toks.select(col("doc_id"), col("is_new"), explode(col("gs")).as("g"))
    val known = inv.filter(!col("is_new"))
      .select(col("g").as("__kg")).distinct()
    val nNew = inv.filter(col("is_new"))
      .join(known, col("g") === col("__kg"), "left")
      .groupBy("doc_id")
      .agg(sum(when(col("__kg").isNull, 1L).otherwise(0L)).as("n_new_grams"))
    toks.filter(col("is_new"))
      .select(col("doc_id"),
        when(col("gs").isNotNull, size(col("gs")).cast("long")).as("n_grams"))
      .join(nNew, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_new_grams"), lit(0L)).as("n_new_grams"))
      .withColumn("novelty_micro",
        when(col("n_grams") > 0, expr("n_new_grams * 1000000 div n_grams")))
  }
}

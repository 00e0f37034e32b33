package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** INGEST n-gram novelty — "how much new information does this batch
  * add?" — the incremental counterpart of the whole-corpus
  * first-occurrence attribution `Corpus.noveltyCensus` (q181): that
  * operator credits every gram to its first document inside ONE
  * corpus, while this one scores an arriving BATCH against the
  * STANDING corpus only (the q156/q180/q191 batch-vs-corpus ingest
  * discipline applied to information content rather than document
  * identity). A re-crawl whose ingest novelty collapses is the
  * "stop crawling this source" signal.
  *
  * 100 TB shape: the standing side reduces to its distinct gram set —
  * at scale that IS the stored gram index the incremental path joins
  * the batch against, never rescanning the corpus; the roll-up is a
  * map-side-combined groupBy on doc. Nothing all-pairs, nothing
  * driver-sized.
  */
object Novelty {

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

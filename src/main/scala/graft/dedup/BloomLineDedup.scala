package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.LineDedup

/** Incremental line-level dedup of a NEW batch against an EXISTING
  * corpus with a broadcast Bloom prefilter — the CCNet / RefinedWeb
  * ingest shape: the corpus's distinct lines are summarized once into
  * a Bloom filter (a few bits per line), every incoming line checks
  * the filter locally inside the scan, and only the tiny
  * bloom-positive fraction (true duplicates + fpp false positives)
  * pays the exact confirm join. Bloom filters have NO false negatives,
  * so the result is bit-identical to the plain semi-join — the filter
  * is purely a data-movement optimization, which is why the DuckDB
  * oracle can check this query with an ordinary join.
  *
  * 100 TB shape: the corpus-side aggregation (distinct lines → Bloom)
  * is one map-side-combined pass that ships ONE sketch, not the lines;
  * the batch scan stays shuffle-free for bloom-negative rows (the
  * overwhelming majority on fresh data). A single driver Bloom holds
  * to ~10⁹ corpus lines at 1% fpp (~1.2 GB); past that, shard it:
  * hash-partition lines, build one Bloom per shard co-partitioned with
  * the batch (the sketch build below is `DataFrame.stat.bloomFilter`,
  * a treeAggregate — swap for per-partition aggregation), or lean on
  * Spark's own runtime bloom join
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) once the
  * corpus side is a join input rather than a prebuilt artifact.
  */
object BloomLineDedup {

  /** Per-batch-document census: (doc_id, n_lines, n_dup, n_kept)
    * where n_dup counts the batch doc's lines that already exist
    * anywhere in `corpus` (exact line equality, `tokensPerLine`-token
    * lines). `fpp` tunes the prefilter only — it cannot change the
    * result, only how many rows reach the confirm join. */
  def census(batch: DataFrame, corpus: DataFrame, idCol: Column,
             textCol: Column, tokensPerLine: Int,
             fpp: Double = 0.01): DataFrame = {
    val bLines = LineDedup.chunkLines(batch, idCol, textCol, tokensPerLine)
    val cLines = LineDedup.chunkLines(corpus, idCol, textCol, tokensPerLine)
      .select("line").distinct()
    // model build (like an index train): one pass over corpus lines.
    // Spark 4's stat.bloomFilter NPEs on an EMPTY input (readFrom of a
    // null merged buffer) — an empty corpus means everything is new.
    val nDistinct = cLines.count()
    val confirmed =
      if (nDistinct == 0L) bLines.filter(lit(false))
      else {
        val sketch = cLines.stat.bloomFilter("line", nDistinct, fpp)
        bLines
          .filter(graft.expressions.BloomMightContain(col("line"), sketch))
          .join(cLines, Seq("line"), "left_semi")
      }
    val dups = confirmed.groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    bLines.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
      .join(dups, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        (col("n_lines") - coalesce(col("n_dup"), lit(0L))).as("n_kept"))
  }

  /** The prefilter's observable effect for audits: per-doc counts of
    * bloom-positive lines vs exactly-confirmed duplicates — the gap is
    * the false-positive traffic that paid the confirm join for
    * nothing. Not oracle-checkable (fpp noise is seed-dependent);
    * pinned by spec instead. */
  def prefilterAudit(batch: DataFrame, corpus: DataFrame, idCol: Column,
                     textCol: Column, tokensPerLine: Int,
                     fpp: Double = 0.01): DataFrame = {
    val bLines = LineDedup.chunkLines(batch, idCol, textCol, tokensPerLine)
    val cLines = LineDedup.chunkLines(corpus, idCol, textCol, tokensPerLine)
      .select("line").distinct()
    val nDistinct = cLines.count()
    val flagged =
      if (nDistinct == 0L) bLines.withColumn("cand", lit(false))
      else {
        val sketch = cLines.stat.bloomFilter("line", nDistinct, fpp)
        bLines.withColumn("cand",
          graft.expressions.BloomMightContain(col("line"), sketch))
      }
    val truth = cLines.withColumn("dup", lit(true))
    flagged.join(truth, Seq("line"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("cand"), lit(1))).as("n_bloom_pos"),
        count(when(col("dup"), lit(1))).as("n_dup"),
        count(when(col("dup") && !col("cand"), lit(1))).as("n_false_neg"))
  }
}

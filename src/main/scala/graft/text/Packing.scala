package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget batches —
  * the standard pre-training step that concatenates documents into
  * constant-length training sequences.
  *
  * [[packSequential]] preserves a global document order exactly via a
  * distributed prefix sum (range-bucketed windows + broadcast bucket
  * offsets) — no single-partition window anywhere, so it scales with
  * the cluster. [[packSharded]] relaxes global order to per-shard
  * order: shard by key hash, pack each shard independently, and
  * namespace batch ids by shard — one shuffle, no offset pass.
  */
object Packing {

  /** batch id = floor(startOffset / budget) over the exact global
    * `orderCols` order. Docs longer than the budget get their own
    * batch(es). The heavy lifting is the distributed prefix sum
    * ([[graft.operators.Operators.withRunningTotal]] — deterministic
    * range buckets + parallel per-bucket windows + broadcast offsets;
    * no single-partition window). */
  def packSequential(df: DataFrame, tokensCol: Column, budget: Int,
                     orderCols: Seq[Column], buckets: Int = 32): DataFrame =
    graft.operators.Operators.withRunningTotal(df, tokensCol, orderCols, buckets)
      .withColumn("batch_id",
        floor((col("__run") - col("__val")) / lit(budget.toDouble)).cast("long"))
      .drop("__val", "__run")

  /** Parallel variant: hash-shard then pack per shard; batch ids are
    * (shard, local batch) pairs encoded as shard·2⁴⁰ + local. */
  def packSharded(df: DataFrame, keyCols: Seq[String], tokensCol: Column,
                  budget: Int, shards: Int, seed: Long = 42L): DataFrame = {
    val shard = pmod(xxhash64(keyCols.map(col) :+ lit(seed): _*), lit(shards.toLong))
    val w = Window.partitionBy(shard)
      .orderBy(keyCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__shard", shard)
      .withColumn("__end", sum(tokensCol).over(w))
      .withColumn("batch_id",
        col("__shard") * lit(1L << 40) +
          floor((col("__end") - tokensCol) / lit(budget.toDouble)).cast("long"))
      .drop("__shard", "__end")
  }

  /** Sliding-window token chunking: split each document into
    * fixed-token chunks with `overlap` shared tokens between
    * neighbors — the context-window prep for RAG indexing and
    * long-document training. Start positions are 1, 1+step, … while
    * start ≤ max(n − overlap, 1) (step = chunkSize − overlap), so the
    * tail is covered without emitting a chunk that is a strict suffix
    * of its predecessor; the last chunk may be short. Pure per-row
    * expressions — one projection, no shuffle, no UDF; chunk_idx =
    * (start−1)/step is derived, not positional, so the output is
    * order-free. */
  def chunk(df: DataFrame, id: Column, text: Column,
            chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    df.select(id.as("doc_id"), TextAnalysis.tokens(text).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(1),
          greatest(size(col("__toks")) - overlap, lit(1)), lit(step)))
          .as("__start"))
      .select(col("doc_id"),
        ((col("__start") - 1) / step).cast("long").as("chunk_idx"),
        array_join(slice(col("__toks"), col("__start"), lit(chunkSize)), " ")
          .as("chunk_text"),
        size(slice(col("__toks"), col("__start"), lit(chunkSize))).cast("long")
          .as("n_tokens"))
  }
}

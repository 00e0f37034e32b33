package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget batches —
  * the standard pre-training step that concatenates documents into
  * constant-length training sequences.
  *
  * [[packSequential]] preserves a global document order exactly (one
  * running-sum window over a single ordered partition — correct but
  * serial; fine up to millions of docs, and it is the oracle-checkable
  * form). [[packSharded]] is the 100 TB shape: shard by key hash, pack
  * each shard independently in parallel, and namespace batch ids by
  * shard — order inside a shard is still deterministic, and no global
  * sort or single-partition window exists anywhere.
  */
object Packing {

  /** batch id = floor(startOffset / budget) over the exact global
    * `orderCols` order. Docs longer than the budget get their own
    * batch(es). */
  def packSequential(df: DataFrame, tokensCol: Column, budget: Int,
                     orderCols: Seq[Column]): DataFrame = {
    val w = Window.orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__end", sum(tokensCol).over(w))
      .withColumn("batch_id",
        floor((col("__end") - tokensCol) / lit(budget.toDouble)).cast("long"))
      .drop("__end")
  }

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
}

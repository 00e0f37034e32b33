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
}

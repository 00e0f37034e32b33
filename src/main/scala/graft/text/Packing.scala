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
    * batch(es).
    *
    * Distributed prefix sum: (1) deterministic range buckets on the
    * leading order key from `approxQuantile` boundaries (bucket is a
    * pure function of the row value, so both passes below agree —
    * unlike `repartitionByRange`, whose sampled boundaries change per
    * job); (2) per-bucket token totals → driver cumsum → tiny
    * broadcast offset table; (3) per-bucket running-sum window plus
    * the bucket's offset. Three linear scans, every stage parallel.
    * The leading order key must be numeric-castable (it seeds the
    * range buckets); ties on it stay in one bucket, and the window
    * breaks them with the full `orderCols` order.
    */
  def packSequential(df: DataFrame, tokensCol: Column, budget: Int,
                     orderCols: Seq[Column], buckets: Int = 32): DataFrame = {
    val keyed = df.withColumn("__ord", orderCols.head.cast("double"))
      .withColumn("__tok", tokensCol)
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = keyed.stat.approxQuantile("__ord", probes, 0.001)
      .distinct.sorted
    val bucketCol =
      if (bounds.isEmpty) lit(0)
      else bounds.map(b => when(col("__ord") >= b, 1).otherwise(0)).reduce(_ + _)
    val bucketed = keyed.withColumn("__bkt", bucketCol)
    val totals = bucketed.groupBy("__bkt").agg(sum("__tok").as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toDF("__bkt", "__off")
    val w = Window.partitionBy(col("__bkt")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsetDf), Seq("__bkt"))
      .withColumn("__end", sum(col("__tok")).over(w) + col("__off"))
      .withColumn("batch_id",
        floor((col("__end") - col("__tok")) / lit(budget.toDouble)).cast("long"))
      .drop("__bkt", "__ord", "__tok", "__off", "__end")
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

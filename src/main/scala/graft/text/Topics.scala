package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Corpus topic labeling (the BERTopic shape): partition documents by
  * an embedding-space cluster inducer, then name each cluster by its
  * highest class-TF-IDF terms — the "what IS this cluster" readout
  * that turns a raw dedup/ANN partition into an auditable corpus map.
  *
  * The inducer here is the deterministic SRP sign-bit bucketing (the
  * q35 LSH family); a production deployment can swap in IVF cell ids
  * ([[graft.similarity.Ivf]]) unchanged — anything that yields
  * (doc_id, cluster) works.
  *
  * 100 TB shape: one token explode feeding two map-side-combined
  * aggregates (per-cluster tf, per-token df), one broadcast of the
  * 1-row doc count, a token-keyed join sized by the vocabulary, and a
  * top-k window partitioned per cluster. Embeddings are read once for
  * the sign bits and never shuffled; document text never moves with
  * the embedding.
  */
object Topics {

  /** Top-`k` c-TF-IDF terms per SRP cluster. Output: (cluster, n_docs,
    * rank, token, tf_c, score_micro) — score = tf_c · idf_micro where
    * idf_micro = round(1e6 · ln(1 + N/df)) is micronized per TOKEN
    * before the integer multiply, so scores are exact BIGINTs. */
  def topTerms(docs: DataFrame, embeds: DataFrame, dim: Int,
               signBits: Int, seed: Long, k: Int): DataFrame = {
    val clustered = embeds.select(col("vec_id").as("doc_id"),
      element_at(Similarity.srpBandKeys(col("embedding"), dim,
        planes = signBits, bands = 1, seed = seed), 1)
        .getField("bh").as("cluster"))
    val toks = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
    val tfc = toks.join(clustered, "doc_id")
      .groupBy("cluster", "token").agg(count(lit(1)).as("tf_c"))
    val dfT = toks.groupBy("token")
      .agg(countDistinct(col("doc_id")).as("df"))
    val nd = docs.agg(count(lit(1)).as("n"))
    val csize = clustered.groupBy("cluster").agg(count(lit(1)).as("n_docs"))
    val idfMicro = round(lit(1000000.0)
      * log(lit(1.0) + col("n") / col("df"))).cast("long")
    val sc = tfc.join(dfT, "token").crossJoin(broadcast(nd))
      .select(col("cluster"), col("token"), col("tf_c"),
        (col("tf_c") * idfMicro).as("score_micro"))
    val w = Window.partitionBy("cluster")
      .orderBy(col("score_micro").desc, col("token").asc)
    sc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .join(csize, "cluster")
      .select(col("cluster"), col("n_docs"), col("rank"), col("token"),
        col("tf_c"), col("score_micro"))
  }
}

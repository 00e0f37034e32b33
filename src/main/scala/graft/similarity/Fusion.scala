package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion for hybrid retrieval (Cormack & Clarke 2009, RRF): a
  * lexical list (BM25) and a dense list (embedding cosine) rank
  * DIFFERENT notions of relevance; summing reciprocal ranks
  * 1/(k₀ + rank) rewards documents near the top of ANY list without
  * ever comparing the incomparable scores themselves — the standard
  * first stage of a RAG / retrieval pipeline.
  *
  * Each reciprocal-rank term is rounded to an integer micro-unit
  * BIGINT before the per-(query, doc) sum, so fusion is exact and
  * order-free (the repo-wide micronization discipline) and replays
  * bit-for-bit in the oracle.
  *
  * 100 TB shape: inputs are already top-k lists — queries × k rows
  * each, never corpus-sized — so the union + groupBy shuffles only
  * candidate mass, and the final window partitions per query over at
  * most Σkᵢ rows. The expensive work lives in the upstream retrievers
  * (posting-list BM25, ANN probes), not here.
  */
object Fusion {

  /** Fuse ranked lists, each (query_id, doc_id, rank) with rank
    * 1-based. Output: (query_id, rank, doc_id, rrf_micro, n_lists)
    * — top `topK` per query by fused score, ties broken by doc_id;
    * `n_lists` counts how many input lists surfaced the doc. */
  def rrf(lists: Seq[DataFrame], topK: Int, rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty && topK > 0 && rrfK >= 0)
    val contrib = lists.map { df =>
      df.select(col("query_id"), col("doc_id"),
        round(lit(1000000.0) / (lit(rrfK) + col("rank"))).cast("long").as("c"))
    }.reduce(_ unionByName _)
    val fused = contrib.groupBy("query_id", "doc_id")
      .agg(sum("c").as("rrf_micro"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "doc_id", "rrf_micro", "n_lists")
  }
}

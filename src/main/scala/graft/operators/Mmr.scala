package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (MMR) selection — the diversity-aware
  * top-k a curation pipeline runs when "take the k best-scoring
  * documents" would hand back k near-clones: each greedy round picks
  * the candidate maximizing
  *
  *   quality − λ · max-similarity-to-already-selected
  *
  * (Carbonell & Goldstein 1998). Similarity here is SimHash-bit
  * overlap — integer Hamming arithmetic over 64-bit signatures, so
  * every round is exact and the whole greedy trace replays in an ANSI
  * oracle (the penalty is an integer div on non-negative operands;
  * ties break on doc id).
  *
  * 100 TB shape: the corpus-sized work is ONE pass — quality scores +
  * signatures — followed by a TakeOrderedAndProject down to the
  * C-candidate shortlist (the standard MMR practice: greedy over a
  * bounded rerank window, never the corpus). The k greedy rounds then
  * run on the C-row checkpointed frame: per round one anti-join +
  * one broadcast of the ≤k selected signatures — model-sized state,
  * no driver-side data path, no quadratic stage anywhere.
  */
object Mmr {

  /** Greedy-select `k` rows from `cands` (columns: doc_id BIGINT,
    * q_micro BIGINT, sig BIGINT) maximizing q_micro − λ·sim where
    * sim = (simBits − minHamming)/simBits, λ in micro units. Returns
    * (sel_rank, doc_id, q_micro, min_hamming, mmr_micro); rank 1 has
    * no selected set yet, so its hamming is null and its MMR score is
    * its quality. */
  def select(cands: DataFrame, k: Int, lambdaMicro: Long,
             simBits: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // the shortlist is tiny; checkpoint once so the k rounds below
    // never re-plan the upstream scoring pipeline
    val c = cands.select("doc_id", "q_micro", "sig").localCheckpoint()
    val mmrExpr =
      expr(s"q_micro - ($lambdaMicro * ($simBits - min_hamming)) div $simBits")
    var sel = c.orderBy(col("q_micro").desc, col("doc_id"))
      .limit(1)
      .select(lit(1).as("sel_rank"), col("doc_id"), col("q_micro"),
        col("sig"), lit(null).cast("long").as("min_hamming"),
        col("q_micro").as("mmr_micro"))
      .localCheckpoint()
    for (t <- 2 to k) {
      val selSigs = sel.select(col("sig").as("ssig"))
      val next = c
        .join(sel.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .crossJoin(broadcast(selSigs))
        .groupBy("doc_id", "q_micro", "sig")
        .agg(min(bit_count(col("sig").bitwiseXOR(col("ssig"))).cast("long"))
          .as("min_hamming"))
        .withColumn("mmr_micro", mmrExpr)
        .orderBy(col("mmr_micro").desc, col("doc_id"))
        .limit(1)
        .select(lit(t).as("sel_rank"), col("doc_id"), col("q_micro"),
          col("sig"), col("min_hamming"), col("mmr_micro"))
      sel = sel.union(next).localCheckpoint()
    }
    sel.select("sel_rank", "doc_id", "q_micro", "min_hamming", "mmr_micro")
      .orderBy("sel_rank")
  }
}

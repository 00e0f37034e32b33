package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval (Robertson–Spärck Jones Okapi weighting) —
  * the retrieval scorer behind benchmark-similarity audits and
  * nearest-document decontamination sweeps. Every per-(query, doc,
  * term) contribution is computed as one double expression with a
  * PINNED operation order (both engines run the identical IEEE op
  * sequence over exact-integer inputs: tf, df, dl, N, Σdl) and is
  * micronized to BIGINT before the per-document sum — so document
  * scores are order-independent exact integers and the top-k
  * hash-matches.
  *
  * 100 TB shape: the corpus moves once into (doc_id, token, tf, dl)
  * postings (two map-side-combined aggregates + one doc-keyed join);
  * corpus stats (N, Σdl) are a 1-row broadcast; the query term table
  * is query-sized and broadcast into the postings scan, so scoring is
  * one shuffle keyed by (query, doc). The final top-k is a per-query
  * window — partition size = one query's candidate count. For
  * pathological stopword-heavy queries add the usual df-cut on the
  * postings side; BM25's idf already drives those terms toward zero.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** (doc_id, token, tf, dl) — term frequency and document length. */
  def postings(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val toks = df.select(idCol.as("doc_id"),
      explode(TextAnalysis.tokens(lower(textCol))).as("token"))
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    tf.join(dl, "doc_id")
  }

  /** Top-k BM25 matches per query document: the query's distinct
    * tokens score against every other document holding any of them.
    * Output: (query_id, rank, doc_id, score_micro). */
  def topK(corpus: DataFrame, idCol: Column, textCol: Column,
           isQuery: Column, k: Int): DataFrame = {
    val post = postings(corpus, idCol, textCol)
    val stats = post.groupBy("doc_id").agg(first("dl").as("dl"))
      .agg(count(lit(1)).as("nd"), sum("dl").as("sdl"))
    val dfreq = post.groupBy("token").agg(count(lit(1)).as("df"))
    val qterms = corpus.filter(isQuery)
      .select(idCol.as("query_id"),
        explode(array_distinct(TextAnalysis.tokens(lower(textCol))))
          .as("token"))
    val scored = post
      .join(broadcast(qterms), "token")
      .filter(col("doc_id") =!= col("query_id"))
      .join(dfreq, "token")
      .crossJoin(broadcast(stats))
    // pinned IEEE op order — mirrored verbatim in the DuckDB oracle
    val idf = log(lit(1.0) + (col("nd") - col("df") + lit(0.5))
      / (col("df") + lit(0.5)))
    val denom = col("tf") + lit(K1) * (lit(0.25)
      + lit(B) * (col("dl") * col("nd") / col("sdl")))
    // 2.2 as a decimal literal on BOTH sides (the compile-time fold of
    // K1 + 1 lands exactly on a representability midpoint — a 1-ulp
    // trap if one engine folds and the other parses)
    val term = idf * (col("tf") * lit(2.2)) / denom
    val byQ = scored.groupBy("query_id", "doc_id")
      .agg(sum(round(term * lit(1000000.0)).cast("long")).as("score_micro"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    byQ.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score_micro")
  }
}

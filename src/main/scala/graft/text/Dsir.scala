package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): fit two bag-of-hashed-ngrams unigram models — one on
  * a TARGET slice (the distribution you want more of), one on the RAW
  * corpus — and weight every document by its log importance ratio
  *
  *   log w(doc) = Σ_f c_f(doc) · [ log p̂_target(f) − log p̂_raw(f) ]
  *
  * over hashed word-bigram features f with Laplace smoothing. Top
  * weights are the documents that look most like the target domain;
  * selection takes the top share.
  *
  * Determinism: feature buckets are md5-derived (cross-engine); the
  * per-bucket log-likelihood ratio is computed ONCE per bucket and
  * immediately micronized to a BIGINT (`round(llr·10⁶)`), so the
  * per-document score Σ c_f · llr_micro_f is an exact integer sum —
  * order-independent under any shuffle, replayable by the oracle. The
  * only float op is one `ln` per bucket, pinned at 6-dp rounding.
  *
  * 100 TB shape: the model fit is ONE map-side-combined groupBy over
  * hashed buckets (output = `buckets` rows — a model, not data) with
  * the raw and target counts in the same pass (conditional agg, no
  * second scan); scoring joins the doc×bucket counts against the
  * broadcast model table and aggregates per doc — map-side combined,
  * one shuffle keyed by doc. Selection is a corpus-wide top-share
  * rank; at real scale swap the global window for an approximate
  * quantile threshold on score_micro (one `percentile_approx` pass)
  * and a stateless filter.
  */
object Dsir {

  /** Hashed word-bigram feature stream: (id, bucket). Bigrams over
    * lowercased \s+ tokens, space-joined; bucket = md5₃₂(gram) mod
    * `buckets`. */
  def features(df: DataFrame, id: Column, text: Column,
               buckets: Int): DataFrame = {
    val toks = split(lower(trim(text)), "\\s+")
    df.select(id.as("id"), toks.as("toks"))
      .select(col("id"), explode(
        zip_with(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b))).as("gram"))
      .select(col("id"),
        (graft.dedup.Dedup.md5Hash32(col("gram")) % buckets).as("bucket"))
  }

  /** The model: per-bucket micronized log-likelihood ratio
    * (bucket, llr_micro) with llr_micro = round(10⁶·(ln((ct+1)/(Nt+B))
    * − ln((cr+1)/(Nr+B)))). `targetPred` selects the target slice BY
    * ROW within `docs` (e.g. lang = 'en'); raw = all docs. Exactly
    * `buckets` rows at most — broadcastable model output. */
  def fit(docs: DataFrame, id: Column, text: Column, targetPred: Column,
          buckets: Int): DataFrame = {
    val f = docs.withColumn("is_t", targetPred)
      .transform(d => features(d, id, text, buckets)
        .join(d.select(id.as("id"), col("is_t")), "id"))
    val cb = f.groupBy("bucket")
      .agg(count(lit(1)).as("cr"), count(when(col("is_t"), lit(1))).as("ct"))
    val tot = cb.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    cb.crossJoin(broadcast(tot))
      .select(col("bucket"),
        round(lit(1000000.0) *
          (log((col("ct") + lit(1.0)) / (col("nt") + lit(buckets.toDouble))) -
            log((col("cr") + lit(1.0)) / (col("nr") + lit(buckets.toDouble)))))
          .cast("long").as("llr_micro"))
  }

  /** Per-document integer importance score: Σ over the doc's buckets
    * of count · llr_micro — (id, score_micro). Docs with no bigrams
    * score 0. */
  def scores(docs: DataFrame, id: Column, text: Column, model: DataFrame,
             buckets: Int): DataFrame = {
    val dc = features(docs, id, text, buckets)
      .groupBy("id", "bucket").agg(count(lit(1)).as("c"))
    val sc = dc.join(broadcast(model), "bucket")
      .groupBy("id").agg(sum(col("c") * col("llr_micro")).as("score_micro"))
    docs.select(id.as("id"))
      .join(sc, Seq("id"), "left")
      .select(col("id"), coalesce(col("score_micro"), lit(0L)).as("score_micro"))
  }
}

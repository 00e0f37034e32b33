package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical n-gram language-model scoring — the KenLM-style
  * perplexity filter every production pretraining pipeline runs (CCNet
  * /RefinedWeb lineage): documents whose tokens are IMPROBABLE under a
  * reference LM are gibberish, OCR noise, or wrong-register text, and
  * score high bits-per-token; fluent in-domain text scores low.
  *
  * This is a bigram model with add-k smoothing trained distributively
  * on a reference corpus, then applied as a per-document score:
  *
  *   p(w₂|w₁) = (c(w₁w₂) + k) / (c(w₁·) + k·V)
  *   bits/token(doc) = −(Σ over the doc's bigram occurrences
  *                       log2 p(w₂|w₁)) / n_bigrams
  *
  * (perplexity = 2^bits — monotone in the reported score, left
  * unexponentiated because `pow` is not correctly rounded and would
  * break cross-engine hash equality; filters threshold bits directly).
  *
  * Determinism discipline (the q134 entropy / q127 PMI pattern): all
  * counts are exact BIGINTs; each bigram TYPE's log-probability is
  * computed once as a pinned double expression and rounded to an
  * integer micro-unit BIGINT, so the per-document sum over occurrences
  * is exact and order-free; the single unrounded double division
  * happens once per output row. Both engines on one libm produce
  * bit-identical log2 of identical doubles.
  *
  * 100 TB shape: the model is vocabulary-bounded — c(w₁w₂) and c(w₁·)
  * collapse through map-side-combined groupBys before anything joins;
  * V is a 1-row aggregate broadcast-cross-joined (lazy, no extra
  * pass). Scoring joins the data-sized occurrence stream to the
  * model-sized LM table on the bigram key — AQE broadcasts the LM when
  * it fits, otherwise both sides shuffle on the bigram key. No
  * driver-side vocabulary, no per-document jobs. Train-once/score-many
  * deployments persist [[bigramLm]]'s output and reuse it.
  */
object LangModel {

  val MicroScale = 1e6

  /** Per-document bigram occurrence stream (id, gram, w1) — grams as
    * space-joined lowercase token pairs (tokens are \s+-split, so the
    * space join is unambiguous). */
  private def bigramOccurrences(df: DataFrame, id: Column,
                                text: Column): DataFrame = {
    val toks = split(lower(trim(text)), "\\s+")
    df.select(id.as("id"), toks.as("toks"))
      .select(col("id"), explode(
        zip_with(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b))).as("gram"))
      .select(col("id"), col("gram"),
        split(col("gram"), " ", 2).getItem(0).as("w1"))
  }

  /** Train the add-k bigram LM on `corpus`: one row per observed
    * bigram type `(gram, lp_micro)` with lp_micro =
    * round(log2 p(w₂|w₁) · 10⁶) — the reusable model artifact.
    * Model-sized output (≤ V² rows, typically ≪). */
  def bigramLm(corpus: DataFrame, id: Column, text: Column,
               addK: Double = 0.5): DataFrame = {
    val o = bigramOccurrences(corpus, id, text)
    val c12 = o.groupBy("gram", "w1").agg(count(lit(1)).as("c12"))
    val c1 = o.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = corpus.select(explode(split(lower(trim(text)), "\\s+")).as("tok"))
      .agg(countDistinct("tok").as("v"))
    c12.join(c1, "w1").crossJoin(broadcast(v))
      .select(col("gram"),
        round(log2((col("c12").cast("double") + lit(addK)) /
            (col("c1").cast("double") + lit(addK) * col("v").cast("double"))) *
          lit(MicroScale), 0).cast("long").as("lp_micro"))
  }

  /** Stupid-backoff trigram scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation") — THE web-scale n-gram
    * scorer: no discounting, no normalization, just relative
    * frequencies with a fixed 0.4 back-off multiplier per level:
    *
    *   S(w₃|w₁w₂) = f(w₁w₂w₃)/f(w₁w₂)         if the trigram was seen
    *              = 0.4 · f(w₂w₃)/f(w₂)        else if the bigram was
    *              = 0.4² · f(w₃)/N             else if the unigram was
    *              = (occurrence dropped)        else (OOV, counted)
    *
    * Scores are NOT probabilities (they don't sum to 1) — which is
    * exactly why the method scales: every level is a pure count
    * ratio, so the "training" is three map-side-combined groupBys and
    * scoring is occurrence-stream joins against vocabulary-bounded
    * tables. Per-type log₂ scores are micronized to BIGINT before the
    * per-document sum (the q146 determinism discipline); the per-doc
    * back-off census (direct/bigram/unigram/dropped) is the
    * train-coverage diagnostic.
    *
    * Returns one row per document of `df` with ≥1 trigram:
    * (id, n_trigrams, n_direct, n_bo2, n_bo1, n_dropped,
    * bits_per_token — null when every occurrence dropped). */
  def stupidBackoffBits(df: DataFrame, corpus: DataFrame, id: Column,
                        text: Column, alpha: Double = 0.4): DataFrame = {
    def toks(t: Column) = split(lower(trim(t)), "\\s+")
    def grams(src: DataFrame, i: Column, t: Column): DataFrame = {
      src.select(i.as("id"), toks(t).as("tk"))
        .select(col("id"), explode(
          // guard: sequence(1, 0) would default to step -1 and yield
          // [1, 0] (element_at(tk, 0) throws), so short docs (<3
          // tokens) must map to an empty index list explicitly —
          // matching the oracle's generate_series(1, 0) = [].
          transform(
            when(size(col("tk")) >= 3, sequence(lit(1), size(col("tk")) - 2))
              .otherwise(array().cast("array<int>")), j =>
            struct(
              concat_ws(" ", element_at(col("tk"), j),
                element_at(col("tk"), j + 1),
                element_at(col("tk"), j + 2)).as("g3"),
              concat_ws(" ", element_at(col("tk"), j),
                element_at(col("tk"), j + 1)).as("gctx"),
              concat_ws(" ", element_at(col("tk"), j + 1),
                element_at(col("tk"), j + 2)).as("g23"),
              element_at(col("tk"), j + 1).as("w2"),
              element_at(col("tk"), j + 2).as("w3")))).as("g"))
        .select(col("id"), col("g.g3").as("g3"), col("g.gctx").as("gctx"),
          col("g.g23").as("g23"), col("g.w2").as("w2"), col("g.w3").as("w3"))
    }
    val train = corpus.select(id.as("id"), text.as("text"))
    val t3 = grams(train, col("id"), col("text"))
      .groupBy("g3").agg(count(lit(1)).as("c123"))
    // t2 feeds the scorer twice (cctx, c23) and t1 three times (cw2,
    // cw3, N) — without a pin each consumer re-tokenizes the corpus
    // (the q197 lesson; StageProbe counted 8 scans, 13 s at sf1).
    // Both tables are vocabulary-bounded (distinct bigrams / tokens),
    // so the eager localCheckpoint stores LM tables, never corpus
    // data; N derives from t1 as an exact count-sum. Cluster-mode
    // caveat (applies to every eager localCheckpoint in this file):
    // it is eager and UNREPLICATED — constructing the DataFrame runs
    // the LM-count jobs, and executor loss makes the pinned partitions
    // unrecoverable (job failure, not wrong results); a cluster
    // deployment should persist the LM tables to storage instead.
    val t2 = train.select(toks(col("text")).as("tk"))
      .select(explode(
        zip_with(
          slice(col("tk"), lit(1), greatest(size(col("tk")) - 1, lit(0))),
          slice(col("tk"), lit(2), greatest(size(col("tk")) - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b))).as("g2"))
      .groupBy("g2").agg(count(lit(1)).as("c2"))
      .localCheckpoint(true)
    val t1 = train.select(explode(toks(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
      .localCheckpoint(true)
    val nTot = t1.agg(sum("c1").as("n_tot"))
    val occ = grams(df.select(id.as("id"), text.as("text")),
      col("id"), col("text"))
    // one score row per trigram TYPE appearing in the scoring stream
    // explicit broadcast on every checkpointed-table join: the tables
    // are vocabulary-bounded (the size class the planner already
    // auto-broadcasts here — all 12 joins plan BHJ with or without the
    // hint at sf1), but a localCheckpoint'ed frame carries RDD-derived
    // statistics the planner is free to mistrust on other
    // configurations, and a silent demotion to sort-merge would
    // shuffle the type stream four times. The hint pins the strategy
    // the stats currently earn. r14 A/B (sf0.1 + sf1 at 8g/2g, 2 runs
    // each, pinned vs unpinned vs hinted): all variants within the
    // epoch's noise band — the pin is kept for its scan-count shape
    // (t2/t1 computed once instead of twice each), not a measured
    // local win.
    val types = occ.select("g3", "gctx", "g23", "w2", "w3").distinct()
      .join(t3, Seq("g3"), "left")
      .join(broadcast(t2.select(col("g2").as("gctx"), col("c2").as("cctx"))),
        Seq("gctx"), "left")
      .join(broadcast(t2.select(col("g2").as("g23"), col("c2").as("c23"))),
        Seq("g23"), "left")
      .join(broadcast(t1.select(col("tok").as("w2"), col("c1").as("cw2"))),
        Seq("w2"), "left")
      .join(broadcast(t1.select(col("tok").as("w3"), col("c1").as("cw3"))),
        Seq("w3"), "left")
      .crossJoin(broadcast(nTot))
    val s =
      when(col("c123").isNotNull,
        col("c123").cast("double") / col("cctx").cast("double"))
        .when(col("c23").isNotNull,
          lit(alpha) * col("c23").cast("double") / col("cw2").cast("double"))
        .when(col("cw3").isNotNull,
          lit(alpha * alpha) * col("cw3").cast("double") /
            col("n_tot").cast("double"))
    val branch =
      when(col("c123").isNotNull, lit(0))
        .when(col("c23").isNotNull, lit(1))
        .when(col("cw3").isNotNull, lit(2))
        .otherwise(lit(3))
    val scored = types.select(col("g3"), branch.as("branch"),
      round(log2(s) * lit(MicroScale), 0).cast("long").as("lp_micro"))
    occ.join(scored, "g3")
      .groupBy("id").agg(
        count(lit(1)).as("n_trigrams"),
        sum(when(col("branch") === 0, 1L).otherwise(0L)).as("n_direct"),
        sum(when(col("branch") === 1, 1L).otherwise(0L)).as("n_bo2"),
        sum(when(col("branch") === 2, 1L).otherwise(0L)).as("n_bo1"),
        sum(when(col("branch") === 3, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("branch") =!= 3, col("lp_micro"))).as("__s"))
      .select(col("id"), col("n_trigrams"), col("n_direct"), col("n_bo2"),
        col("n_bo1"), col("n_dropped"),
        when(col("n_trigrams") > col("n_dropped"),
          round(-col("__s").cast("double") /
            ((col("n_trigrams") - col("n_dropped")).cast("double") *
              lit(MicroScale)), 6)).as("bits_per_token"))
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, "Doremi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"),
    * distilled to a deterministic one-step multiplicative-weights
    * update over exact integer losses:
    *
    *   excess(d) = loss under the corpus-wide GENERALIST bigram LM
    *             − loss under domain d's own SPECIALIST bigram LM
    *             (clipped at 0, in micro-bits/bigram)
    *   weight(d) ∝ base_share(d) · exp(η · excess(d))
    *
    * Domains the shared model underserves relative to an in-domain
    * model carry distributional mass the mixture should fund — the
    * Group-DRO upweighting step, with the domain-specialist LM
    * standing in for DoReMi's proxy model.
    *
    * Determinism discipline: both LMs' log-probs are micro-unit
    * BIGINTs (order-free sums); excess uses integer division on a
    * non-negative numerator; the one exp() per DOMAIN is immediately
    * re-pinned to a micro×10⁶ BIGINT before the normalizing sum, so
    * no double summation order ever matters.
    *
    * 100 TB shape: both LMs are vocabulary-bounded map-side-combined
    * aggregates; scoring joins the occurrence stream to the LM tables
    * on (gram) / (domain, gram); everything after the per-doc
    * aggregate is domains-sized. */
  def domainExcessWeights(df: DataFrame, id: Column, text: Column,
                          domain: Column, eta: Double = 1.0,
                          addK: Double = 0.5): DataFrame = {
    val docs = df.select(id.as("id"), domain.as("domain"), text.as("text"))
    val toks = split(lower(trim(col("text"))), "\\s+")
    val o = docs.select(col("id"), col("domain"), toks.as("toks"))
      .select(col("id"), col("domain"), explode(
        zip_with(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b))).as("gram"))
      .select(col("id"), col("domain"), col("gram"),
        split(col("gram"), " ", 2).getItem(0).as("w1"))
    def lpMicro(c12: Column, c1: Column, v: Column): Column =
      round(log2((c12.cast("double") + lit(addK)) /
          (c1.cast("double") + lit(addK) * v.cast("double"))) *
        lit(MicroScale), 0).cast("long")
    // the GENERALIST counts are the domain counts re-aggregated, and
    // EVERY count table derives from ONE materialized (domain, gram)
    // aggregate: without the pin, each of the seven consumers below
    // re-tokenized and re-exploded the corpus (Catalyst has no
    // subtree-level CTE materialization — r13's StageProbe counted
    // eight full corpus scans, 24 s at sf1). c12d is
    // vocabulary-bounded (domains × distinct bigrams — model-sized at
    // any corpus scale), so the eager localCheckpoint stores an
    // LM-table, never corpus-scale data; c1d is the w1-marginal of
    // c12d (sum of exact counts — identical to counting the stream).
    // The corpus itself is scanned exactly 3×: c12d, the distinct
    // (domain, token) vocabulary, and perDoc's scoring stream.
    val c12d = o.groupBy("domain", "gram", "w1").agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val c1d = c12d.groupBy("domain", "w1").agg(sum("c12").as("c1"))
    // distinct-token V keeps its own (cheap, two-scan) aggregates: a
    // second eager checkpoint of the distinct (domain, token) pairs
    // measured as a net LOSS at sf0.1 — the extra job's fixed cost
    // exceeds the one saved scan (V does not sum across domains, so
    // vd/vg cannot derive from c12d)
    val tokStream = docs.select(col("domain"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
    val vd = tokStream.groupBy("domain").agg(countDistinct("tok").as("v"))
    val vg = tokStream.agg(countDistinct("tok").as("v"))
    val c12g = c12d.groupBy("gram", "w1").agg(sum("c12").as("c12"))
    val c1g = c1d.groupBy("w1").agg(sum("c1").as("c1"))
    val lmg = c12g.join(c1g, "w1").crossJoin(broadcast(vg))
      .select(col("gram"),
        lpMicro(col("c12"), col("c1"), col("v")).as("lp_micro"))
    val lmd = c12d.join(c1d, Seq("domain", "w1")).join(vd, "domain")
      .select(col("domain"), col("gram"),
        lpMicro(col("c12"), col("c1"), col("v")).as("lpd_micro"))
    val perDoc = o.join(lmg, "gram").join(lmd, Seq("domain", "gram"))
      .groupBy("domain", "id").agg(count(lit(1)).as("nb"),
        sum("lp_micro").as("sg"), sum("lpd_micro").as("sd"))
    val perDom = perDoc.groupBy("domain").agg(
      count(lit(1)).as("n_docs"), sum("nb").as("bigram_mass"),
      sum("sg").as("sgt"), sum("sd").as("sdt"))
      .withColumn("excess_micro",
        expr("greatest(sdt - sgt, CAST(0 AS BIGINT)) div bigram_mass"))
    val tot = perDom.agg(sum("bigram_mass").as("mass_tot"))
    val w = perDom.crossJoin(broadcast(tot))
      .withColumn("base_share",
        col("bigram_mass").cast("double") / col("mass_tot").cast("double"))
      .withColumn("wrm",
        round(col("base_share") *
          exp(lit(eta) * col("excess_micro").cast("double") / lit(MicroScale)) *
          lit(1e12), 0).cast("long"))
    val wtot = w.agg(sum("wrm").as("w_tot"))
    w.crossJoin(broadcast(wtot))
      .select(col("domain"), col("n_docs"), col("bigram_mass"),
        col("excess_micro"),
        round(col("base_share"), 6).as("base_share"),
        round(col("wrm").cast("double") / col("w_tot").cast("double"), 6)
          .as("weight"))
      .orderBy("domain")
  }

  /** Score every document of `df` under the LM trained on `corpus`
    * (pass `df` twice for self-scoring): (id, n_bigrams, bits_per_token),
    * ascending fluency — high bits = improbable text. Documents with
    * fewer than two tokens have no bigrams and are omitted (score
    * undefined). Bigrams unseen in the training corpus are dropped
    * from the sum (self-scoring never hits this; external scoring
    * should train with a <unk>-mapped vocabulary first). */
  def perplexityBits(df: DataFrame, corpus: DataFrame, id: Column,
                     text: Column, addK: Double = 0.5): DataFrame = {
    val lm = bigramLm(corpus, id, text, addK)
    bigramOccurrences(df, id, text)
      .join(lm, "gram")
      .groupBy("id").agg(count(lit(1)).as("n_bigrams"),
        sum("lp_micro").as("__s"))
      .select(col("id"), col("n_bigrams"),
        round(-col("__s").cast("double") /
          (col("n_bigrams").cast("double") * lit(MicroScale)), 6)
          .as("bits_per_token"))
  }
}

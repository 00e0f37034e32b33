package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.operators.Sampling
import graft.text.{Packing, TextAnalysis}

/** The end-to-end corpus-cleaning composition a training-data team
  * actually runs — quality gate (threshold + optional trained
  * classifier) → corpus-wide line dedup (optional) → benchmark
  * decontamination → exact dedup → near-dup clustering → canonical
  * selection → semantic dedup (optional, embedding-based) →
  * deterministic sample → sequence packing — wired from the library's
  * operators so a user gets the whole pipeline as one call. Every
  * stage is a lazy DataFrame transform; stage counts are the only
  * actions.
  *
  * Scale shape: the gate and fingerprints are per-row expressions; the
  * dedup stages shuffle content hashes and (band, hash, id) keys only;
  * components checkpoint per round; packing is the distributed prefix
  * sum. Nothing collects documents to the driver.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 30,
      maxTokens: Int = 10000,
      minAvgTokenLen: Double = 2.0,
      maxAvgTokenLen: Double = 12.0,
      minStopwordRatio: Double = 0.01,
      maxPunctRatio: Double = 0.2,
      classifier: Option[graft.ml.Logit.Model] = None,
      classifierThreshold: Double = 0.5,
      lineDedupTokens: Option[Int] = None,
      nearDupThreshold: Double = 0.8,
      // md5 variant makes the near-dup stage replayable by an ANSI-SQL
      // oracle; the default 32-bit hash is the cheaper production path
      shingleHasher: (Column, Int) => Column = Dedup.shingleHashes32,
      benchmark: Option[DataFrame] = None,
      decontamN: Int = 8,
      benchTextCol: String = "text",
      embeddings: Option[DataFrame] = None,
      semDedupTau: Double = 0.4,
      semDedupNlist: Int = 8,
      semDedupIters: Int = 3,
      embIdCol: String = "vec_id",
      embVecCol: String = "embedding",
      sampleFraction: Double = 1.0,
      sampleSeed: Long = 42L,
      packBudget: Int = 2048,
      // Eagerly localCheckpoint each counted stage: without it every
      // stage count REPLAYS the whole pipeline prefix (the k-th count
      // does k stages of work — O(k²) total; measured 2.2x on the q159
      // funnel). On a cluster swap for reliable checkpoint()/a staging
      // write: localCheckpoint pins executors.
      checkpointStages: Boolean = true)

  final case class Result(cleaned: DataFrame, stageCounts: Seq[(String, Long)])

  /** docs must expose `id` (bigint) and `text` columns; returns the
    * cleaned corpus with `n_tokens` and `batch_id` plus per-stage
    * surviving-row counts. */
  def clean(docs: DataFrame, id: Column, text: Column,
            cfg: Config = Config()): Result = {
    val counts = Seq.newBuilder[(String, Long)]
    // pin each counted stage so stage k's count (and every later
    // stage) reads materialized rows instead of replaying stages 1..k
    def st(df: DataFrame): DataFrame =
      if (cfg.checkpointStages) df.localCheckpoint(true) else df
    counts += ("input" -> docs.count())

    // 1. quality gate (Gopher-style thresholds over per-row features),
    //    optionally sharpened by a trained logistic classifier scored
    //    over the SAME feature projection (one scan serves both)
    val feats = TextAnalysis.qualityFeatures(docs, text)
      .filter(col("n_tokens") >= cfg.minTokens &&
        col("n_tokens") <= cfg.maxTokens &&
        col("avg_token_len") >= cfg.minAvgTokenLen &&
        col("avg_token_len") <= cfg.maxAvgTokenLen &&
        col("stopword_ratio") >= cfg.minStopwordRatio &&
        col("punct_ratio") <= cfg.maxPunctRatio)
    val classified = cfg.classifier match {
      case Some(m) => feats.filter(m.scoreExpr >= cfg.classifierThreshold)
      case None => feats
    }
    val gated = st(classified
      .drop("n_chars", "avg_token_len", "stopword_ratio", "punct_ratio"))
    counts += ("quality_gate" -> gated.count())

    // 1b. corpus-wide line dedup (optional): strip every repeated line
    //     (first occurrence survives), rewrite the text, and recount
    //     tokens — RefinedWeb's boilerplate-removal stage. Runs BEFORE
    //     exact dedup so two docs differing only in shared boilerplate
    //     collapse to identical residues.
    val lineDeduped = cfg.lineDedupTokens match {
      case Some(ltoks) => st {
        val rewritten = graft.text.LineDedup
          .rewrite(gated, id, text, ltoks)
          .filter(col("n_kept") > 0)
          .select(col("doc_id").as("__ld_id"), col("kept_text"))
        gated.join(rewritten, id === col("__ld_id"))
          .withColumn(text.toString(), col("kept_text"))
          .withColumn("n_tokens", TextAnalysis.tokenCount(col("kept_text")))
          .drop("__ld_id", "kept_text")
      }
      case None => gated
    }
    if (cfg.lineDedupTokens.isDefined)
      counts += ("line_dedup" -> lineDeduped.count())

    // 2. benchmark decontamination (when an eval set is supplied):
    //    drop any doc sharing a word n-gram with the benchmark — the
    //    leakage check belongs BEFORE dedup so a contaminated doc can't
    //    become its cluster's surviving canonical
    val decontaminated = cfg.benchmark match {
      case Some(bench) =>
        val flagged = graft.text.Decontam.contaminationReport(
          lineDeduped, bench, cfg.decontamN,
          idCol = id.toString(), textCol = text.toString(),
          benchTextCol = cfg.benchTextCol)
          .select(id.as("__contaminated_id"))
        st(lineDeduped.join(flagged, id === col("__contaminated_id"), "left_anti"))
      case None => lineDeduped
    }
    if (cfg.benchmark.isDefined)
      counts += ("decontaminate" -> decontaminated.count())

    // 3. exact dedup: min-id representative per identical content
    val exact = st(Dedup.dropExactDups(decontaminated, id, text))
    counts += ("exact_dedup" -> exact.count())

    // 4. near-dup clustering: LSH pairs → components → keep the
    //    component label (min id); docs outside any component survive
    val pairs = Dedup.minhashNearDups(exact, id, text, cfg.nearDupThreshold,
      shingleHasher = cfg.shingleHasher)
    val nearDeduped = st(Dedup.keepCanonical(exact, id, pairs))
    counts += ("near_dedup" -> nearDeduped.count())

    // 5. semantic dedup (when an embedding table is supplied): IVF
    //    cells bound the pairwise cosine work, drop any doc whose cell
    //    holds a lower-id embedding at cosine ≥ tau. Anti-join on the
    //    DROPPED ids so docs without an embedding row survive — absence
    //    of evidence never deletes a document.
    val semantic = cfg.embeddings match {
      case Some(embs) =>
        val idx = graft.similarity.Ivf.train(embs, cfg.semDedupNlist,
          cfg.semDedupIters, idCol = cfg.embIdCol, vecCol = cfg.embVecCol)
        val dropIds = graft.similarity.Similarity
          .semDedup(idx.assigned, cfg.semDedupTau,
            idCol = cfg.embIdCol, vecCol = cfg.embVecCol)
          .filter(!col("kept"))
          .select(col(cfg.embIdCol).as("__sem_drop_id"))
        st(nearDeduped.join(dropIds, id === col("__sem_drop_id"), "left_anti"))
      case None => nearDeduped
    }
    if (cfg.embeddings.isDefined)
      counts += ("semantic_dedup" -> semantic.count())

    // 6. deterministic key-hash sample
    val sampled =
      if (cfg.sampleFraction >= 1.0) semantic
      else Sampling.deterministicSample(semantic,
        Seq(id.toString()), cfg.sampleFraction, cfg.sampleSeed)
    counts += ("sample" -> sampled.count())

    // 7. sequence packing into token-budget batches
    val packed = Packing.packSequential(sampled, col("n_tokens"),
      cfg.packBudget, Seq(id))
    Result(packed, counts.result())
  }
}

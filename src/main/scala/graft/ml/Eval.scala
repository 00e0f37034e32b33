package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Operators

/** Rater-agreement metrics: the eval-governance layer over the
  * curation pipeline's independent keep/drop deciders (the rule gate,
  * the trained classifier, a human sample). Agreement says whether a
  * cheap rater can stand in for an expensive one; chance-corrected
  * kappa says whether it agrees for a better reason than base rates.
  */
object Eval {

  /** Cohen's kappa between two boolean raters, plus the confusion
    * census it derives from: one output row with the four cell
    * counts, raw agreement p_o, chance agreement p_e, and
    * kappa = (p_o − p_e) / (1 − p_e).
    *
    * Everything reduces to ONE map-side-combined aggregate of four
    * conditional counts — exact BIGINTs, order-free — and the metrics
    * are fixed scalar double expressions over those counts, so the
    * result hash-replays across engines and partitionings at any
    * scale. Rows where either rater is null are excluded (and
    * reported), matching the pairwise-complete convention. When both
    * raters are constant, p_e = 1 and kappa is undefined → null.
    *
    * 100 TB shape: a single pass, no shuffle wider than one row. */
  def kappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val a = raterA.cast("boolean")
    val b = raterB.cast("boolean")
    val both = a.isNotNull && b.isNotNull
    val cell = (x: Boolean, y: Boolean) =>
      sum(when(both && a === lit(x) && b === lit(y), 1L).otherwise(0L))
    val counts = df.agg(
      sum(when(both, 1L).otherwise(0L)).as("n"),
      sum(when(!both, 1L).otherwise(0L)).as("n_excluded"),
      cell(true, true).as("n11"), cell(true, false).as("n10"),
      cell(false, true).as("n01"), cell(false, false).as("n00"))
    val n = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / n
    val pe = ((col("n11") + col("n10")).cast("double") *
      (col("n11") + col("n01")).cast("double") +
      (col("n01") + col("n00")).cast("double") *
        (col("n10") + col("n00")).cast("double")) / (n * n)
    counts.select(col("n"), col("n_excluded"),
      col("n11"), col("n10"), col("n01"), col("n00"),
      round(po, 6).as("agreement"), round(pe, 6).as("chance_agreement"),
      when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** ROC AUC of a continuous score against a boolean label, computed
    * exactly as the Mann–Whitney U statistic with tie-averaged ranks —
    * the threshold-free complement to [[kappa]]'s fixed-cut agreement
    * (AUC = P(score(pos) > score(neg)) + ½·P(tie)).
    *
    * Exactness: the corpus first COLLAPSES to one row per distinct
    * score value `(score, n, n_pos)` — ranks then derive from exact
    * BIGINT cumulative counts, with tie groups contributing their
    * DOUBLED average rank `lo + hi` so every intermediate stays an
    * integer; the single double division happens once at the end.
    * One output row: (n, n_pos, n_neg, n_scores, auc); degenerate
    * single-class inputs yield auc = null.
    *
    * 100 TB shape: the only data-sized op is the map-side-combined
    * groupBy(score); the rank prefix-sum runs on the COMPRESSED
    * (distinct-score-count ≤ 10⁶ for 6dp scores in [0,1]) table via
    * the distributed range-bucket running total — no single-partition
    * window, no event-sized shuffle. */
  def aucRoc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val labeled = df.select(score.cast("double").as("__s"),
        label.cast("boolean").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
    // eager checkpoint of the COMPRESSED table: the prefix sum below
    // needs two actions (range-bound sampling + the windowed agg), and
    // without lineage truncation each would recompute the full
    // upstream pipeline; the materialized state is distinct-score
    // sized, not corpus sized
    val byScore = labeled.groupBy("__s").agg(
      count(lit(1)).as("__n"),
      sum(when(col("__y"), 1L).otherwise(0L)).as("__np"))
      .localCheckpoint(true)
    // ascending-score cumulative count: tie group at cumulative c with
    // n members spans ranks (c-n+1)..c → doubled average rank = 2c-n+1
    val ranked = Operators.withRunningTotal(byScore, col("__n"),
      Seq(col("__s")))
    val agg = ranked.agg(
      sum("__n").as("n"), sum("__np").as("n_pos"),
      count(lit(1)).as("n_scores"),
      sum(col("__np") * (col("__run") * 2 - col("__n") + 1)).as("__r2"))
    val nPos = col("n_pos").cast("double")
    val nNeg = (col("n") - col("n_pos")).cast("double")
    // 2U = Σ_pos 2·rank − n_pos(n_pos+1); AUC = U / (n_pos·n_neg)
    val u2 = col("__r2") - col("n_pos") * (col("n_pos") + 1)
    agg.select(col("n"), col("n_pos"),
      (col("n") - col("n_pos")).as("n_neg"), col("n_scores"),
      when(col("n_pos") > 0 && col("n") > col("n_pos"),
        round(u2.cast("double") / (nPos * nNeg * 2.0), 6)).as("auc"))
  }

  /** Reliability-diagram calibration census: probability predictions
    * bucketed into `bins` equal-width bins, one row per non-empty bin
    * with exact counts, the mean predicted probability, the empirical
    * positive rate, and the |gap| between them — the per-bin terms of
    * expected calibration error. A claimed-probability classifier
    * whose 0.9-bin wins 60% of the time needs recalibrating before its
    * scores gate a corpus.
    *
    * Exactness: predictions are 6dp-rounded probabilities, so
    * `round(p·10⁶)` recovers exact BIGINT micro-units; per-bin sums
    * are integer and order-free; the three output doubles each derive
    * in one pinned expression. Bin = floor(p·bins) with p = 1.0
    * clamped into the top bin.
    *
    * 100 TB shape: one map-side-combined groupBy(bin) — `bins` rows
    * out, one pass, nothing else. */
  def calibration(df: DataFrame, prob: Column, label: Column,
                  bins: Int = 10): DataFrame = {
    val p = prob.cast("double")
    val b = least(floor(p * bins).cast("int"), lit(bins - 1))
    val g = df.select(b.as("bin"),
        round(p * 1000000.0, 0).cast("long").as("__pm"),
        label.cast("boolean").as("__y"))
      .filter(col("bin").isNotNull && col("__y").isNotNull)
      .groupBy("bin").agg(
        count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum("__pm").as("__pmsum"))
    val meanPred = col("__pmsum").cast("double") /
      (col("n").cast("double") * 1000000.0)
    val fracPos = col("n_pos").cast("double") / col("n").cast("double")
    g.select(col("bin").cast("long").as("bin"), col("n"), col("n_pos"),
        round(meanPred, 6).as("mean_pred"),
        round(fracPos, 6).as("frac_pos"),
        round(abs(round(meanPred, 6) - round(fracPos, 6)), 6).as("abs_gap"))
      .orderBy("bin")
  }

  /** Spearman rank correlation between two continuous columns with
    * tie-averaged ranks — "do these two document scores RANK the
    * corpus the same way?", the agreement audit between independent
    * quality signals (classifier probability vs LM perplexity, gate
    * margin vs dedup cluster size) that Pearson on raw values gets
    * wrong whenever either scale is nonlinear.
    *
    * Exactness (the [[aucRoc]] discipline, per variable): collapse to
    * one row per distinct value, derive DOUBLED average ranks
    * (BIGINT) from the distributed range-bucket prefix sum, join the
    * two rank maps back by value, and reduce to five exact BIGINT
    * sums in ONE map-side-combined aggregate. The closed-form rho
    * combines those sums in pinned double order (sqrt is correctly
    * rounded — the q135 OLS discipline). Σr² ≈ 4n³ must stay under
    * 2⁶³: exact to ~10⁶ rows; beyond that sample or widen to
    * DECIMAL(38,0). Constant columns (zero rank variance) → null.
    *
    * 100 TB shape: two map-side-combined groupBys + two compressed
    * prefix sums + two value-keyed joins (each a shuffle bounded by
    * the distinct-value count) + one single-row aggregate. */
  def spearman(df: DataFrame, x: Column, y: Column): DataFrame = {
    // eager checkpoint: the two rank maps and the row-level join below
    // are five downstream actions over this relation — without lineage
    // truncation each recomputes the caller's full upstream pipeline
    // (q151's LM training ran 5× before this). The materialized state
    // is two doubles per row, and spearman's exactness bound caps
    // useful inputs at ~10⁶ rows anyway (sample above that).
    val base = df.select(x.cast("double").as("__x"), y.cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint(true)
    def rank2(valCol: String, out: String): DataFrame = {
      val byVal = base.groupBy(valCol).agg(count(lit(1)).as("__n"))
        .localCheckpoint(true)
      Operators.withRunningTotal(byVal, col("__n"), Seq(col(valCol)))
        .select(col(valCol), (col("__run") * 2 - col("__n") + 1).as(out))
    }
    val joined = base
      .join(rank2("__x", "__ra"), "__x")
      .join(rank2("__y", "__rb"), "__y")
    val agg = joined.agg(count(lit(1)).as("n"),
      sum("__ra").as("__sa"), sum("__rb").as("__sb"),
      sum(col("__ra") * col("__ra")).as("__saa"),
      sum(col("__rb") * col("__rb")).as("__sbb"),
      sum(col("__ra") * col("__rb")).as("__sab"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val va = n * d("__saa") - d("__sa") * d("__sa")
    val vb = n * d("__sbb") - d("__sb") * d("__sb")
    agg.select(col("n"),
      when(va > 0 && vb > 0,
        round((n * d("__sab") - d("__sa") * d("__sb")) /
          (sqrt(va) * sqrt(vb)), 6)).as("spearman_rho"))
  }

  /** Proper-scoring-rule summary: Brier score and log-loss (base-2)
    * of probability predictions against a boolean label, one output
    * row (n, n_pos, brier, log_loss_bits). Brier rewards calibration
    * AND sharpness in one number ([[calibration]] shows the per-bin
    * decomposition); log-loss is the training objective itself.
    *
    * Exactness: with 6dp probabilities, each squared error
    * (p_micro − y·10⁶)² is an exact BIGINT ≤ 10¹², so the Brier sum
    * is exact and order-free to ~9·10⁶ rows per partition-free sum —
    * beyond that the per-row values still sum exactly in BIGINT up to
    * 2⁶³ (≈9·10⁶ TB of rows). Log-loss terms −log2(p or 1−p) round to
    * micro-unit BIGINTs before summing (the q134 discipline);
    * predictions are clamped to [10⁻⁶, 1−10⁻⁶] so a confident-wrong
    * 0/1 probability costs ~19.93 bits instead of ∞ — the clamp is
    * part of the contract, not a numerical accident.
    *
    * 100 TB shape: ONE map-side-combined aggregate, no shuffle wider
    * than one row. */
  def brierLogLoss(df: DataFrame, prob: Column, label: Column): DataFrame = {
    val pm = round(prob.cast("double") * 1000000.0, 0).cast("long")
    val pmc = least(greatest(pm, lit(1L)), lit(999999L))
    val y = label.cast("boolean")
    val ym = when(y, 1000000L).otherwise(0L)
    val se = (pm - ym) * (pm - ym)
    val llTerm = round(-log2(
      when(y, pmc).otherwise(lit(1000000L) - pmc).cast("double") / 1000000.0) *
      lit(1000000.0), 0).cast("long")
    val filtered = df.select(se.as("__se"), llTerm.as("__ll"),
        when(y, 1L).otherwise(0L).as("__y"))
      .filter(col("__se").isNotNull && col("__y").isNotNull)
    filtered.agg(count(lit(1)).as("n"), sum("__y").as("n_pos"),
        sum("__se").as("__sse"), sum("__ll").as("__sll"))
      .select(col("n"), col("n_pos"),
        round(col("__sse").cast("double") /
          (col("n").cast("double") * 1e12), 6).as("brier"),
        round(col("__sll").cast("double") /
          (col("n").cast("double") * 1e6), 6).as("log_loss_bits"))
  }
}

package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}

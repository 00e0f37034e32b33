package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection: exact two-sample Kolmogorov–Smirnov
  * statistics between every pair of groups — the data-quality gate
  * that catches a source whose length/score distribution shifted
  * between snapshots or diverges from its peers.
  *
  * The KS numerator is kept EXACT: for samples a (size n_a) and b
  * (size n_b), D = max|F_a−F_b| = max|cum_a·n_b − cum_b·n_a|/(n_a·n_b),
  * and the BIGINT numerator max|cum_a·n_b − cum_b·n_a| is computed in
  * integer arithmetic — hash-stable across engines (the double `ks` is
  * derived from exact inputs at the very end). BIGINT bound: safe up
  * to ~3·10⁹ rows per group; larger groups switch the numerator to
  * DECIMAL(38,0).
  *
  * 100 TB shape: the corpus collapses FIRST to (group, value, count) —
  * value-compressed, so everything after is bounded by
  * #groups² · #distinct-values, not row count. ECDF running sums use a
  * window partitioned per group-PAIR (bounded by distinct metric
  * values of a discrete measure, never corpus-sized); pair fan-out is
  * two equi-joins against a broadcast pair list, no non-equi join.
  */
object Drift {

  /** Mergeable per-key moment summaries for INCREMENTAL aggregate
    * maintenance: the state is (n, Σx, Σx²) in exact integer
    * micro-units — component-wise ADDITION merges any two states, so
    * "full recompute" ≡ "stored state + delta batch" bit-for-bit, in
    * any order, across any partitioning. Mean/variance derive at read
    * time only. This is the warehouse pattern that turns an O(history)
    * nightly aggregate into an O(delta) one; the same triple is the
    * batch twin of the streaming Welford state.
    * Pick `scale` for the value range: Σx² must stay under 2⁶³, so
    * scale·|x| around 10⁴ (the milli default suits 2-decimal metrics
    * up to |x|~10) is safe to ~10¹⁰ rows per key; widen to
    * DECIMAL(38,0) past that. */
  def momentState(df: DataFrame, keyCol: Column, valueCol: Column,
                  scale: Long = 1000L): DataFrame = {
    val mv = round(valueCol.cast("double") * scale.toDouble).cast("long")
    df.select(keyCol.as("key"), mv.as("mv"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum("mv").as("sx"),
        sum(col("mv") * col("mv")).as("sxx"))
  }

  /** Merge two moment-state tables (full outer, component sums). */
  def mergeMomentStates(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("key"), col("n"), col("sx"), col("sxx"))
      .unionAll(b.select(col("key"), col("n"), col("sx"), col("sxx")))
      .groupBy("key")
      .agg(sum("n").as("n"), sum("sx").as("sx"), sum("sxx").as("sxx"))

  /** Read side: derive mean and sample variance from a state table. */
  def momentStats(state: DataFrame, scale: Long = 1000L): DataFrame =
    state.select(col("key"), col("n"), col("sx"), col("sxx"),
      round(col("sx").cast("double") / (col("n") * scale.toDouble), 6).as("mean"),
      when(col("n") > 1,
        round((col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") / col("n")) /
          ((col("n") - 1) * scale.toDouble * scale.toDouble), 6))
        .as("variance"))

  /** Pearson χ² test of independence between two categorical columns:
    * one row (n, n_cells, dof, chi2). Every grid cell contributes —
    * including observed-zero cells (their expected count still adds) —
    * via the exact-integer numerator (o·N − r·c)²; only the final
    * per-cell division is floating point, and the cell terms are
    * summed in a DETERMINISTIC (a, b) order through a left-to-right
    * fold, so the statistic is bit-stable across engines and runs.
    * Cell arithmetic runs in DOUBLE from the first multiply — (o·N)²
    * overflows BIGINT at ~10⁶ rows for associated columns, while the
    * identical IEEE double sequence stays deterministic in both
    * engines at any N (exact up to 2⁵³ per product).
    *
    * 100 TB shape: the corpus collapses immediately to |A|·|B| cells;
    * marginals re-aggregate from the cells (map-side combined); the
    * tiny grid cross-joins broadcast marginals and the fold runs over
    * one collected array inside a single aggregate row. */
  def chi2Independence(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val obs = df.select(aCol.as("a"), bCol.as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val rt = obs.groupBy("a").agg(sum("o").as("r"))
    val ct = obs.groupBy("b").agg(sum("o").as("c"))
    val tot = obs.agg(sum("o").as("n"))
    val grid = rt.crossJoin(broadcast(ct))
      .join(obs, Seq("a", "b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("n"), col("r"), col("c"),
        coalesce(col("o"), lit(0L)).as("o"))
      .withColumn("term", {
        val od = col("o").cast("double"); val nd = col("n").cast("double")
        val rd = col("r").cast("double"); val cd = col("c").cast("double")
        (od * nd - rd * cd) * (od * nd - rd * cd) / (nd * rd * cd)
      })
    grid.groupBy()
      .agg(max("n").as("n"),
        countDistinct("a").as("na"), countDistinct("b").as("nb"),
        array_sort(collect_list(struct(col("a"), col("b"), col("term"))))
          .as("cells"))
      .select(col("n"), (col("na") * col("nb")).as("n_cells"),
        ((col("na") - 1) * (col("nb") - 1)).as("dof"),
        round(aggregate(col("cells"), lit(0.0),
          (acc, x) => acc + x.getField("term")), 6).as("chi2"))
  }

  /** Shared all-pairs expansion: collapse to (group, value, count),
    * broadcast the group-pair list, and merge both sides into
    * (grp_a, grp_b, value, ca, cb) — the value-compressed relation
    * every pairwise drift statistic ([[ksPairs]], [[psiPairs]])
    * starts from. */
  private def pairCounts(df: DataFrame, groupCol: Column,
                         valueCol: Column): DataFrame = {
    val cnt = df.select(groupCol.as("grp"), valueCol.as("value"))
      .groupBy("grp", "value").agg(count(lit(1)).as("c"))
    val groups = cnt.select("grp").distinct()
    val pairs = groups.select(col("grp").as("grp_a"))
      .crossJoin(groups.select(col("grp").as("grp_b")))
      .filter(col("grp_a") < col("grp_b"))
    val sideA = cnt.join(broadcast(pairs), col("grp") === col("grp_a"))
      .select(col("grp_a"), col("grp_b"), col("value"),
        col("c").as("ca"), lit(0L).as("cb"))
    val sideB = cnt.join(broadcast(pairs), col("grp") === col("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("value"),
        lit(0L).as("ca"), col("c").as("cb"))
    sideA.unionAll(sideB)
      .groupBy("grp_a", "grp_b", "value")
      .agg(sum("ca").as("ca"), sum("cb").as("cb"))
  }

  /** All-pairs KS: (grp_a, grp_b, n_a, n_b, ks_num, ks) with
    * grp_a < grp_b, ks = ks_num/(n_a·n_b) rounded to 6 dp. */
  def ksPairs(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame = {
    val merged = pairCounts(df, groupCol, valueCol)
    val pairW = Window.partitionBy("grp_a", "grp_b")
    val runW = pairW.orderBy(col("value").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("cum_a", sum("ca").over(runW))
      .withColumn("cum_b", sum("cb").over(runW))
      .withColumn("n_a", sum("ca").over(pairW))
      .withColumn("n_b", sum("cb").over(pairW))
      .groupBy("grp_a", "grp_b")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
          .as("ks_num"))
      .withColumn("ks",
        round(col("ks_num").cast("double") / (col("n_a") * col("n_b")), 6))
  }

  /** All-pairs Population Stability Index — the industry-standard
    * model-monitoring drift metric alongside [[ksPairs]] (rank-based)
    * and [[chi2Independence]] (categorical): PSI = Σ_bins (p−q)·ln(p/q)
    * over `bins` equal-width buckets of the pair's combined integer
    * value range, Laplace-smoothed (+1 per bin) so empty buckets stay
    * finite. Rule of thumb: <0.1 stable, 0.1–0.25 moderate, >0.25
    * major shift.
    *
    * Determinism: bucket assignment is pure integer arithmetic
    * ((v−mn)·B div span), counts are exact BIGINTs, and the B bin
    * terms fold in sorted bin order (the chi2 sorted-collect
    * discipline) — one ln per bin, 6dp at the end.
    *
    * Overflow bound: the pair's value span must stay under 2^63/B
    * (~9·10¹⁷ at B=10) or (v−mn)·B wraps — raw 64-bit hash values
    * need pre-bucketing. The guard FAILS FAST (raise_error, checked
    * span-wrap-proof in double) instead of silently mis-binning — the
    * ANSI oracle errors on the same input, so the engines agree.
    *
    * 100 TB shape: identical to [[ksPairs]] — the corpus collapses
    * FIRST to (group, value, count); everything downstream is bounded
    * by #groups² · #bins. */
  def psiPairs(df: DataFrame, groupCol: Column, valueCol: Column,
               bins: Int = 10): DataFrame = {
    val merged = pairCounts(df, groupCol, valueCol.cast("long"))
      .withColumnRenamed("value", "v")
    val pairW = Window.partitionBy("grp_a", "grp_b")
    val spanOk = (col("mx").cast("double") - col("mn").cast("double")) <
      (Long.MaxValue.toDouble / bins)
    val binned = merged
      .withColumn("mn", min("v").over(pairW))
      .withColumn("mx", max("v").over(pairW))
      .withColumn("bin", when(spanOk, expr(s"((v - mn) * $bins) div (mx - mn + 1)"))
        .otherwise(raise_error(lit(
          s"psiPairs: value span overflows BIGINT binning at $bins bins" +
            " — pre-bucket the values"))))
      .groupBy("grp_a", "grp_b", "bin")
      .agg(sum("ca").as("ca"), sum("cb").as("cb"))
    // dense 0..bins-1 grid so empty buckets contribute their smoothed
    // term on both sides (a missing bin is information, not absence)
    val grid = merged.select("grp_a", "grp_b").distinct().crossJoin(
      broadcast(spark_range_df(binned, bins).select(col("bin"))))
    val full = grid.join(binned, Seq("grp_a", "grp_b", "bin"), "left")
      .select(col("grp_a"), col("grp_b"), col("bin"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .withColumn("n_a", sum("ca").over(pairW))
      .withColumn("n_b", sum("cb").over(pairW))
    val p = (col("ca") + 1).cast("double") / (col("n_a") + bins).cast("double")
    val q = (col("cb") + 1).cast("double") / (col("n_b") + bins).cast("double")
    full.withColumn("term", (p - q) * log(p / q))
      .groupBy("grp_a", "grp_b")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        array_sort(collect_list(struct(col("bin"), col("term"))))
          .as("__terms"))
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        round(aggregate(col("__terms"), lit(0.0),
          (acc, x) => acc + x.getField("term")), 6).as("psi"))
  }

  /** Literal 0..bins-1 bin-index relation on the input's session. */
  private def spark_range_df(ref: DataFrame, bins: Int): DataFrame =
    ref.sparkSession.range(bins).select(col("id").as("bin"))

  /** Burstiness census: the Fano factor (variance/mean) of per-bucket
    * counts for each key — the dispersion diagnostic behind
    * [[rollingCountAnomalies]]: ≈1 is Poisson-like arrivals, ≫1 is
    * bursty (bot traffic, batch replays), ≪1 is over-regular
    * (schedulers, heartbeats). Sample variance and mean derive from
    * exact BIGINT Σc and Σc² in one pinned double expression. Keys
    * with fewer than 2 buckets or zero mean are dropped (undefined).
    *
    * 100 TB shape: one map-side-combined (key, bucket) count, then a
    * per-key aggregate over bucket counts — bounded by #keys ·
    * #buckets, never event-sized. Overflow: Σc² needs per-bucket
    * counts under √(2^63/#buckets) (the [[rollingCountAnomalies]]
    * bound, documented there). */
  def burstiness(df: DataFrame, key: Column, bucket: Column): DataFrame = {
    val counts = df.groupBy(key.as("k"), bucket.as("b"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy("k")
      .agg(count(lit(1)).as("n_buckets"), sum("c").as("sx"),
        sum(col("c") * col("c")).as("sxx"))
      .filter(col("n_buckets") > 1 && col("sx") > 0)
      .select(col("k"), col("n_buckets"), col("sx").as("n_events"),
        round(((col("sxx").cast("double") * col("n_buckets") -
          col("sx").cast("double") * col("sx").cast("double")) /
          (col("n_buckets").cast("double") * (col("n_buckets") - 1))) /
          (col("sx").cast("double") / col("n_buckets").cast("double")), 6)
          .as("fano"))
  }

  /** Corpus-concentration census: HHI (Herfindahl — Σ share²) and the
    * Gini coefficient of the per-key row distribution in ONE output
    * row — the data-mixture diagnostic that says whether a corpus is
    * dominated by a few sources (HHI → 1, Gini → 1) or balanced
    * (HHI → 1/n, Gini → 0) before a temperature re-mix
    * ([[graft.operators.Sampling.sqrtTemperatureMixture]]) is chosen.
    *
    * Both indices derive from exact BIGINT sums: Σc² for HHI and
    * Σ(rank·c) for Gini over counts ranked ascending (ties broken by
    * key for determinism), each divided out in one pinned double at
    * the end. G = (2·Σrc − (n+1)·Σc) / (n·Σc).
    *
    * 100 TB shape: the corpus collapses FIRST to (key, count) — one
    * map-side-combined aggregate — so everything after is bounded by
    * #keys. The ascending rank is an exact distributed prefix sum
    * ([[graft.operators.Operators.withRunningTotal]]: range buckets +
    * parallel per-bucket windows + broadcast offsets — no
    * single-partition window even at millions of keys). */
  def concentration(df: DataFrame, key: Column): DataFrame = {
    val counts = df.groupBy(key.as("k")).agg(count(lit(1)).as("c"))
    val ranked = graft.operators.Operators
      .withRunningTotal(counts, lit(1L), Seq(col("c"), col("k")))
    ranked
      .agg(count(lit(1)).as("n_groups"), sum("c").as("n_rows"),
        sum(col("c") * col("c")).as("sum_c2"),
        sum(col("__run") * col("c")).as("sum_rc"))
      .select(col("n_groups"), col("n_rows"),
        round(col("sum_c2").cast("double") /
          (col("n_rows").cast("double") * col("n_rows").cast("double")), 6)
          .as("hhi"),
        round((lit(2.0) * col("sum_rc").cast("double") -
          (col("n_groups") + 1).cast("double") * col("n_rows").cast("double")) /
          (col("n_groups").cast("double") * col("n_rows").cast("double")), 6)
          .as("gini"))
  }

  /** Rolling-window count-anomaly detection: bucket events per key,
    * z-score each bucket's count against the TRAILING `window`
    * observed buckets (current excluded — an anomaly must not inflate
    * its own baseline). The monitoring primitive for event streams:
    * traffic spikes, dead sources, bot bursts.
    *
    * Determinism: window sums of counts are exact BIGINTs (integer
    * addition commutes, any accumulation order), variance and z derive
    * from them in one pinned double expression — never `stddev()`,
    * whose float accumulation is engine-order-dependent. Buckets with
    * an incomplete trailing window or zero variance are skipped.
    *
    * Overflow bound: Σ n² over the window must stay under 2^63, i.e.
    * each bucket count under √(2^63/W) (~6.2·10⁸ at W=24). The guard
    * FAILS FAST (raise_error) instead of silently corrupting the
    * variance — a hotter bucket means the bucketing is too coarse;
    * re-bucket or pre-scale (the [[momentState]] discipline).
    *
    * 100 TB shape: one map-side-combined count by (key, bucket), then
    * windows partitioned per key — partition size = one key's bucket
    * history (bounded by the time range), never event-count-sized. */
  def rollingCountAnomalies(df: DataFrame, key: Column, bucket: Column,
                            window: Int): DataFrame = {
    val nLimit = math.sqrt(Long.MaxValue.toDouble / window).toLong - 1
    val counts = df.groupBy(key.as("k"), bucket.as("b"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n", when(col("n") <= nLimit, col("n"))
        .otherwise(raise_error(lit(
          s"rollingCountAnomalies: bucket count exceeds $nLimit — " +
            s"sum of squares would overflow BIGINT at window=$window; " +
            "use finer buckets"))))
    val trail = Window.partitionBy("k").orderBy(col("b").asc)
      .rowsBetween(-window, -1)
    val wd = window.toDouble
    counts
      .withColumn("__cnt", count(lit(1)).over(trail))
      .withColumn("__sx", sum("n").over(trail))
      .withColumn("__sxx", sum(col("n") * col("n")).over(trail))
      .filter(col("__cnt") === window)
      .withColumn("__var",
        (col("__sxx").cast("double") * window -
          col("__sx").cast("double") * col("__sx").cast("double")) /
          (wd * (window - 1)))
      .filter(col("__var") > 0)
      .select(col("k"), col("b"), col("n"),
        round((col("n").cast("double") - col("__sx").cast("double") / wd) /
          sqrt(col("__var")), 6).as("z"))
  }
}

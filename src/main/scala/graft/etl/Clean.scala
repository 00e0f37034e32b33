package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cleaning operators (SURVEY.md §2.2 P5, P7–P9): null-drop, winsorize,
  * IQR outlier filtering, z-score filtering. All plan builders
  * (`DataFrame => DataFrame`) — scalar statistics (quantiles, moments)
  * are computed in ONE tiny aggregate and broadcast back via cross join,
  * never collected row-by-row; the filters themselves are pushdown-able
  * predicates.
  */
object Clean {

  /** `dropna()` over a column subset (`train_model.py:21`). */
  def dropNulls(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop("any", cols)

  /** Null census per column, descending (EDA cell 4). */
  def nullCensus(df: DataFrame, cols: Seq[String]): DataFrame = {
    val counts = df.agg(
      count(lit(1)).as("__n"),
      cols.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(c)): _*)
    // melt to (column, n_null) for a stable tall shape
    val stacked = cols.map(c =>
      s"'${c.replace("'", "''")}', `$c`").mkString(", ")
    counts.selectExpr(s"stack(${cols.size}, $stacked) AS (column, n_null)")
      .orderBy(col("n_null").desc, col("column").asc)
  }

  /** Winsorize: clip each column at its exact (qLo, qHi) quantiles
    * (EDA cell 18). Fences come from the distributed-rank construction
    * ([[graft.analytics.Stats.columnQuantilesRow]] — same bits as
    * `percentile`, no per-column value buffer, one melted pass for any
    * number of columns); the clip is a codegen'd least/greatest per
    * row. */
  def winsorize(df: DataFrame, cols: Seq[String],
                qLo: Double = 0.01, qHi: Double = 0.99): DataFrame = {
    val fences = graft.analytics.Stats
      .columnQuantilesRow(df, cols, Seq(qLo, qHi))
      .select(cols.flatMap(c => Seq(
        col(s"__q0_$c").as(s"__lo_$c"), col(s"__q1_$c").as(s"__hi_$c"))): _*)
    val clipped = cols.foldLeft(df.crossJoin(broadcast(fences))) { (d, c) =>
      d.withColumn(c, least(greatest(col(c), col(s"__lo_$c")), col(s"__hi_$c")))
    }
    clipped.drop(cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }

  /** Drop rows outside the IQR fences on any column; nulls pass
    * (EDA cell 19's `between | isna` semantics, P8). Fences via the
    * same distributed-rank quantiles as [[winsorize]]. */
  def iqrFilter(df: DataFrame, cols: Seq[String], k: Double = 1.5): DataFrame = {
    val fences = graft.analytics.Stats
      .columnQuantilesRow(df, cols, Seq(0.25, 0.75))
      .select(cols.flatMap { c =>
        val q1 = col(s"__q0_$c"); val q3 = col(s"__q1_$c")
        Seq((q1 - (q3 - q1) * k).as(s"__lo_$c"),
          (q3 + (q3 - q1) * k).as(s"__hi_$c"))
      }: _*)
    val pred = cols
      .map(c => col(c).between(col(s"__lo_$c"), col(s"__hi_$c")) || col(c).isNull)
      .reduce(_ && _)
    df.crossJoin(broadcast(fences)).filter(pred)
      .drop(cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }

  /** Melt `cols` to a tall (groupCols…, feature, v-as-double) frame —
    * one scan covers every feature, so the censuses below stay
    * single-pass however many columns they audit. */
  private def meltToDouble(df: DataFrame, cols: Seq[String],
                           groupCols: Seq[String]): DataFrame = {
    val stackExpr = s"stack(${cols.size}, " +
      cols.map(c => s"'${c.replace("'", "''")}', CAST(`$c` AS DOUBLE)")
        .mkString(", ") + ") AS (feature, v)"
    df.selectExpr(groupCols.map(g => s"`$g`") :+ stackExpr: _*)
  }

  /** Shared body of the IQR censuses: fences and outlier counts both
    * read one value-compressed `(grp, v, c)` frame; exact interpolated
    * quartiles come from [[graft.analytics.Stats.percentilesFromCounts]]
    * (distributed rank — no per-group percentile buffer, the q221/
    * 100 TB fix), and a `spine` left-join keeps every group present
    * with n = 0 even when all its values are null — the shape the
    * pre-compressed form produced. */
  private def iqrCensusFromTall(tall: DataFrame, grp: Column,
                                k: Double): DataFrame = {
    val comp = tall.filter(col("v").isNotNull)
      .groupBy(grp.as("grp"), col("v")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val fences = graft.analytics.Stats
      .percentilesFromCounts(comp, Seq(0.25, 0.75))
      .groupBy("grp")
      .agg(min(when(col("p") === 0.25, col("q"))).as("q1"),
        min(when(col("p") === 0.75, col("q"))).as("q3"))
      .select(col("grp"),
        (col("q1") - (col("q3") - col("q1")) * k).as("__lo"),
        (col("q3") + (col("q3") - col("q1")) * k).as("__hi"))
    val counts = comp.join(broadcast(fences), "grp")
      .groupBy("grp")
      .agg(sum(when(col("v") < col("__lo") || col("v") > col("__hi"), col("c"))
        .otherwise(0L)).as("n_outliers"))
    val spine = tall.groupBy(grp.as("grp")).agg(count(col("v")).as("n"))
    spine.join(counts, Seq("grp"), "left")
      .withColumn("n_outliers", coalesce(col("n_outliers"), lit(0L)))
      .withColumn("pct_outliers",
        round(col("n_outliers").cast("double") / col("n") * 100, 6))
  }

  /** IQR outlier census per column (EDA cell 13): n, n_outliers, pct.
    * 100 TB shape: one melted scan, value-compressed exact quartiles
    * ([[graft.analytics.Stats.percentilesFromCounts]]) — no per-column
    * `percentile` buffer, no extra pass per feature. */
  def iqrOutlierCensus(df: DataFrame, cols: Seq[String], k: Double = 1.5): DataFrame =
    iqrCensusFromTall(meltToDouble(df, cols, Nil), col("feature"), k)
      .select(col("grp").as("feature"), col("n"), col("n_outliers"),
        col("pct_outliers"))
      .orderBy("feature")

  /** Grouped IQR outlier census (EDA cell 14, A10): fences computed
    * WITHIN each (group × feature) — same single melted pass as
    * [[iqrOutlierCensus]] with a struct group key, so all group×feature
    * fences cost one compressed shuffle however many features. */
  def iqrOutlierCensusBy(df: DataFrame, cols: Seq[String], groupCols: Seq[String],
                         k: Double = 1.5): DataFrame = {
    val tall = meltToDouble(df, cols, groupCols)
    val grp = struct(col("feature") +: groupCols.map(col): _*)
    iqrCensusFromTall(tall, grp, k)
      .select(groupCols.map(g => col(s"grp.`$g`").as(g)) ++
        Seq(col("grp.feature").as("feature"), col("n"), col("n_outliers"),
          col("pct_outliers")): _*)
      .orderBy((col("feature") +: groupCols.map(col)): _*)
  }

  /** MAD outlier census per group — the ROBUST outlier gate (modified
    * z-score, Iglewicz–Hoaglin): flag x when 0.6745·|x − median| / MAD
    * exceeds 3.5. Complements the mean/stddev gate ([[zscoreFilter]],
    * q14) and the IQR fences (q90/q64): one extreme value drags a mean
    * and inflates a stddev enough to mask its neighbors, while medians
    * have 50% breakdown. The threshold compares in cross-multiplied
    * integer-literal form (6745·|x − med| > 35000·MAD), so no
    * non-exact decimal literal ever enters double math (the 0.4·0.4
    * cross-engine trap); median/MAD are reported rounded to 6 dp.
    * Both medians come from
    * [[graft.analytics.Stats.groupedPercentilesExact]]'s distributed-
    * rank construction (value-compressed counts + range-bucketed
    * prefix sum) — bit-identical to Spark's `percentile` but with NO
    * per-group value buffer: the exact-`percentile` form shuffled
    * 412 MB into 3 aggregation buffers at sf1 (q221), a straight OOM
    * at 100×, while this shape's shuffle is spread over (group, value)
    * keys and its sorts are range-bucketed. Groups with MAD = 0 (over
    * half the values identical) flag every other value, which is the
    * documented modified-z behavior. */
  def madOutlierCensus(df: DataFrame, group: Column, value: Column): DataFrame = {
    // ONE raw scan: everything after this checkpoint — both medians,
    // the deviation regroup and the outlier census — is
    // distinct-value-sized
    val compX = df.select(group.as("grp"), value.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("grp", "v").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val medians = graft.analytics.Stats
      .percentilesFromCounts(compX, Seq(0.5))
      .select(col("grp"), col("q").as("med"))
    // |v − med| maps distinct values to (at most as many) distinct
    // deviations with counts preserved — a compressed-to-compressed
    // regroup, never a second pass over rows; the per-group median
    // rides along (constant within group)
    val compAd = compX.join(broadcast(medians), "grp")
      .select(col("grp"), abs(col("v") - col("med")).as("v"),
        col("c"), col("med"))
      .groupBy("grp", "v").agg(sum("c").as("c"), min("med").as("med"))
      .localCheckpoint(true)
    val spreads = graft.analytics.Stats
      .percentilesFromCounts(compAd, Seq(0.5))
      .select(col("grp"), col("q").as("mad0"))
    compAd.join(broadcast(spreads), "grp")
      .groupBy("grp")
      .agg(sum("c").as("n"),
        round(min("med"), 6).as("median"),
        round(min("mad0"), 6).as("mad"),
        sum(when(col("v") * 6745.0 > col("mad0") * 35000.0, col("c"))
          .otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_micro", expr("n_outliers * 1000000 div n"))
      .orderBy("grp")
  }

  /** Flag/drop rows where any |z| > k, population stddev (pandas ddof=0,
    * EDA cell 4 — SURVEY §7.4.3). */
  def zscoreFilter(df: DataFrame, cols: Seq[String], k: Double = 3.0): DataFrame = {
    val moments = df.agg(
      cols.flatMap(c => Seq(
        avg(col(c)).as(s"__m_$c"), stddev_pop(col(c)).as(s"__s_$c"))).head,
      cols.flatMap(c => Seq(
        avg(col(c)).as(s"__m_$c"), stddev_pop(col(c)).as(s"__s_$c"))).tail: _*)
    val maxZ = cols
      .map(c => abs((col(c) - col(s"__m_$c")) / col(s"__s_$c")))
      .reduce(greatest(_, _))
    df.crossJoin(broadcast(moments)).filter(maxZ <= k || maxZ.isNull)
      .drop(cols.flatMap(c => Seq(s"__m_$c", s"__s_$c")): _*)
  }
}

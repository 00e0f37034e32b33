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
    * (EDA cell 18). One aggregate computes every fence; the clip is a
    * codegen'd least/greatest per row. */
  def winsorize(df: DataFrame, cols: Seq[String],
                qLo: Double = 0.01, qHi: Double = 0.99): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(expr(s"percentile(`$c`, $qLo)").as(s"__lo_$c"),
        expr(s"percentile(`$c`, $qHi)").as(s"__hi_$c"))
    }
    val fences = df.agg(aggs.head, aggs.tail: _*)
    val clipped = cols.foldLeft(df.crossJoin(broadcast(fences))) { (d, c) =>
      d.withColumn(c, least(greatest(col(c), col(s"__lo_$c")), col(s"__hi_$c")))
    }
    clipped.drop(cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }

  /** IQR fences per column: (q1 − k·IQR, q3 + k·IQR) (EDA cell 13). */
  private def iqrFenceCols(cols: Seq[String], k: Double): Seq[Column] =
    cols.flatMap { c =>
      val q1 = expr(s"percentile(`$c`, 0.25)")
      val q3 = expr(s"percentile(`$c`, 0.75)")
      Seq((q1 - (q3 - q1) * k).as(s"__lo_$c"), (q3 + (q3 - q1) * k).as(s"__hi_$c"))
    }

  /** Drop rows outside the IQR fences on any column; nulls pass
    * (EDA cell 19's `between | isna` semantics, P8). */
  def iqrFilter(df: DataFrame, cols: Seq[String], k: Double = 1.5): DataFrame = {
    val fences = df.agg(iqrFenceCols(cols, k).head, iqrFenceCols(cols, k).tail: _*)
    val pred = cols
      .map(c => col(c).between(col(s"__lo_$c"), col(s"__hi_$c")) || col(c).isNull)
      .reduce(_ && _)
    df.crossJoin(broadcast(fences)).filter(pred)
      .drop(cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }

  /** IQR outlier census per column (EDA cell 13): n, n_outliers, pct. */
  def iqrOutlierCensus(df: DataFrame, cols: Seq[String], k: Double = 1.5): DataFrame = {
    val fences = df.agg(iqrFenceCols(cols, k).head, iqrFenceCols(cols, k).tail: _*)
    val withF = df.crossJoin(broadcast(fences))
    val rows = cols.map { c =>
      withF.agg(
        lit(c).as("feature"),
        count(col(c)).as("n"),
        sum(when(!col(c).between(col(s"__lo_$c"), col(s"__hi_$c")), 1).otherwise(0))
          .as("n_outliers"))
    }
    rows.reduce(_.unionByName(_))
      .withColumn("pct_outliers",
        round(col("n_outliers").cast("double") / col("n") * 100, 6))
      .orderBy("feature")
  }

  /** Grouped IQR outlier census (EDA cell 14, A10): fences computed
    * WITHIN each group, one aggregate per feature over grouped
    * percentiles — all group×feature fences in `cols.size` passes. */
  def iqrOutlierCensusBy(df: DataFrame, cols: Seq[String], groupCols: Seq[String],
                         k: Double = 1.5): DataFrame = {
    val rows = cols.map { c =>
      val q1 = expr(s"percentile(`$c`, 0.25)")
      val q3 = expr(s"percentile(`$c`, 0.75)")
      val fences = df.groupBy(groupCols.map(col): _*)
        .agg((q1 - (q3 - q1) * k).as("__lo"), (q3 + (q3 - q1) * k).as("__hi"))
      df.join(broadcast(fences), groupCols)
        .groupBy(groupCols.map(col): _*)
        .agg(
          first(lit(c)).as("feature"),
          count(col(c)).as("n"),
          sum(when(!col(c).between(col("__lo"), col("__hi")), 1).otherwise(0))
            .as("n_outliers"))
    }
    rows.reduce(_.unionByName(_))
      .withColumn("pct_outliers",
        round(col("n_outliers").cast("double") / col("n") * 100, 6))
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
    * Three grouped passes, each keyed by the same group column — the
    * partitioning is reused, nothing driver-sized; groups with
    * MAD = 0 (over half the values identical) flag every other value,
    * which is the documented modified-z behavior. */
  def madOutlierCensus(df: DataFrame, group: Column, value: Column): DataFrame = {
    val base = df.select(group.as("grp"), value.cast("double").as("x"))
      .filter(col("x").isNotNull)
    val medians = base.groupBy("grp").agg(expr("percentile(x, 0.5D)").as("med"))
    val dev = base.join(medians, "grp")
      .withColumn("ad", abs(col("x") - col("med")))
    val spreads = dev.groupBy("grp")
      .agg(min("med").as("med2"), expr("percentile(ad, 0.5D)").as("mad0"))
    dev.drop("med").join(spreads, "grp")
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        round(min("med2"), 6).as("median"),
        round(min("mad0"), 6).as("mad"),
        sum(when(col("ad") * 6745.0 > col("mad0") * 35000.0, 1L).otherwise(0L))
          .as("n_outliers"))
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

package graft.analytics

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Descriptive statistics (SURVEY.md §2.4 A6–A12): summary stats, exact
  * quantiles, z-scores, pairwise correlation — the reference's EDA
  * surface. Each is a small number of aggregate passes; correlation is
  * one aggregate computing all pairs (no per-pair jobs).
  */
object Stats {

  /** describe(): count/mean/stddev/min/max per column, exact quartiles
    * via `percentile` (pandas-interpolation-compatible, A6/A8). */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    val rows = cols.map { c =>
      df.agg(
        lit(c).as("column"),
        count(col(c)).as("count"),
        round(avg(col(c)), 6).as("mean"),
        round(stddev_pop(col(c)), 6).as("std_pop"),
        round(min(col(c)).cast("double"), 6).as("min"),
        round(expr(s"percentile(`$c`, 0.25)"), 6).as("q25"),
        round(expr(s"percentile(`$c`, 0.50)"), 6).as("q50"),
        round(expr(s"percentile(`$c`, 0.75)"), 6).as("q75"),
        round(max(col(c)).cast("double"), 6).as("max"))
    }
    rows.reduce(_.unionByName(_)).orderBy("column")
  }

  /** z-score columns (population stddev — pandas ddof=0, A7). */
  def withZScores(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      avg(col(c)).as(s"__m_$c"), stddev_pop(col(c)).as(s"__s_$c")))
    val moments = df.agg(aggs.head, aggs.tail: _*)
    val withZ = cols.foldLeft(df.crossJoin(broadcast(moments))) { (d, c) =>
      d.withColumn(s"z_$c", (col(c) - col(s"__m_$c")) / col(s"__s_$c"))
    }
    withZ.drop(cols.flatMap(c => Seq(s"__m_$c", s"__s_$c")): _*)
  }

  /** Full pairwise Pearson correlation matrix in ONE aggregate pass
    * (A11): tall (col_a, col_b, corr) output, col_a < col_b. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 6).as(s"${a}__$b")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) =>
      s"'${a}', '${b}', `${a}__$b`"
    }.mkString(", ")
    row.selectExpr(s"stack(${pairs.size}, $stacked) AS (col_a, col_b, corr)")
      .orderBy("col_a", "col_b")
  }

  /** Top-k strongest correlations against a target column (A12). */
  def topCorrelations(df: DataFrame, cols: Seq[String], target: String,
                      k: Int = 10): DataFrame =
    corrMatrix(df, cols :+ target)
      .filter(col("col_a") === target || col("col_b") === target)
      .withColumn("feature",
        when(col("col_a") === target, col("col_b")).otherwise(col("col_a")))
      .select("feature", "corr")
      .orderBy(abs(col("corr")).desc, col("feature").asc)
      .limit(k)
}

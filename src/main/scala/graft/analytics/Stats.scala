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

  /** Equi-depth (equal-frequency) histogram — the optimizer-stats
    * histogram, built WITHOUT a global `ntile` window: the corpus
    * collapses to one row per distinct value, the distributed prefix
    * sum assigns each value its rank interval [s, e], and a broadcast
    * `buckets`-row frame intersects those intervals with the standard
    * ntile boundaries (first N mod b buckets take one extra row).
    * Per-bucket (n_rows, min, max) only depend on the sorted value
    * multiset, so tied rows straddling a boundary cannot change the
    * output — the result is exactly `ntile(buckets) ORDER BY value`.
    * Everything after the first groupBy is value-cardinality-sized. */
  def equiDepthHistogram(df: DataFrame, value: org.apache.spark.sql.Column,
                         buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val v = df.groupBy(value.as("value")).agg(count(lit(1)).as("c"))
    val run = graft.operators.Operators
      .withRunningTotal(v, col("c"), Seq(col("value")))
      .withColumn("__e", col("__run"))
      .withColumn("__s", col("__e") - col("c") + 1)
    val n = v.agg(sum("c").as("__n"))
    val bIdx = df.sparkSession.range(buckets).select(col("id").as("bucket"))
    run.crossJoin(broadcast(n)).crossJoin(broadcast(bIdx))
      .withColumn("__q", floor(col("__n") / buckets).cast("long"))
      .withColumn("__rem", col("__n") % buckets)
      .withColumn("__lo",
        col("bucket") * col("__q") + least(col("bucket"), col("__rem")))
      .withColumn("__hi", col("__lo") + col("__q") +
        when(col("bucket") < col("__rem"), 1L).otherwise(0L))
      .filter(col("__s") <= col("__hi") && col("__e") > col("__lo"))
      .withColumn("__rows",
        least(col("__e"), col("__hi")) - greatest(col("__s"), col("__lo") + 1) + 1)
      .groupBy("bucket")
      .agg(sum("__rows").as("n_rows"),
        min("value").cast("double").as("min_val"),
        max("value").cast("double").as("max_val"))
      .orderBy("bucket")
  }
}

package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-quality KPI aggregates re-expressed Spark-first.
  *
  * Reference surface: global n/MAE/RMSE (`Reporte_Tecnico.md:475-484`),
  * R² via CTE + scalar subquery (`Reporte_Tecnico.md:487-502`), per-year
  * grouped KPIs (`Reporte_Tecnico.md:508-523`), offline sklearn metrics
  * (`src/train_model.py:34-36`).
  *
  * Design: ONE aggregation pass. The reference computes R² with a
  * two-scan CTE (mean first, then deviations); we use the algebraic
  * identity  SS_tot = n · var_pop(y)  so every metric — including R² —
  * falls out of a single map-side-combinable aggregate. At 100 TB this
  * halves the scans and keeps the shuffle at O(groups).
  */
object Kpis {

  /** n, MAE, RMSE, R² in one pass, rounded to 6 dp for oracle hashing. */
  def regressionMetrics(df: DataFrame, yTrue: Column, yPred: Column): DataFrame = {
    val err = yTrue - yPred
    df.agg(
      count(lit(1)).as("n"),
      round(avg(abs(err)), 6).as("mae"),
      round(sqrt(avg(pow(err, 2))), 6).as("rmse"),
      round(lit(1) - sum(pow(err, 2)) /
        nullif(count(lit(1)) * var_pop(yTrue), lit(0)), 6).as("r2"))
  }

  /** Per-group n, MAE, RMSE (reference "KPIs por año"). */
  def groupedMetrics(df: DataFrame, keys: Seq[String], yTrue: Column, yPred: Column): DataFrame = {
    val err = yTrue - yPred
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        round(avg(abs(err)), 6).as("mae"),
        round(sqrt(avg(pow(err, 2))), 6).as("rmse"))
  }

  /** Top-k rows by absolute error with a deterministic tie-break —
    * planned as TakeOrderedAndProject (per-partition heaps, no global
    * sort). Reference: top10_peores_errores (`Reporte_Tecnico.md:529-538`).
    */
  def topKErrors(df: DataFrame, yTrue: Column, yPred: Column,
                 k: Int, tieBreak: Seq[Column]): DataFrame = {
    val withErr = df.withColumn("abs_error", abs(yTrue - yPred))
    withErr.orderBy(col("abs_error").desc +: tieBreak: _*).limit(k)
  }
}

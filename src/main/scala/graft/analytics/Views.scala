package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's warehouse SQL surface (SURVEY §3.3-3.4): named views
  * over the predictions table — `kpis_globales`, `kpis_por_anio`,
  * `top10_peores_errores` (`Reporte_Tecnico.md:475-539`,
  * `scripts/peek_sqlite.py:10-19`) — re-expressed as Spark SQL temp
  * views so the identical analytical SQL text runs on the engine.
  */
object Views {

  /** Register `predictions` plus the reference's three KPI views.
    * Expected columns: country, year, y_true, y_pred, is_train, is_test.
    */
  def register(spark: SparkSession, predictions: DataFrame): Unit = {
    predictions.createOrReplaceTempView("predictions")
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW kpis_globales AS
        |SELECT count(*) AS n,
        |  avg(abs(y_true - y_pred)) AS mae,
        |  sqrt(avg(power(y_true - y_pred, 2))) AS rmse,
        |  1 - sum(power(y_true - y_pred, 2))
        |      / nullif(count(*) * var_pop(y_true), 0) AS r2
        |FROM predictions WHERE is_test = 1""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW kpis_por_anio AS
        |SELECT year, count(*) AS n,
        |  avg(abs(y_true - y_pred)) AS mae,
        |  sqrt(avg(power(y_true - y_pred, 2))) AS rmse
        |FROM predictions WHERE is_test = 1
        |GROUP BY year ORDER BY year""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW top10_peores_errores AS
        |SELECT country, year, y_true, y_pred,
        |  y_true - y_pred AS error,
        |  abs(y_true - y_pred) AS abs_error
        |FROM predictions WHERE is_test = 1
        |ORDER BY abs_error DESC, country, year LIMIT 10""".stripMargin)
  }
}

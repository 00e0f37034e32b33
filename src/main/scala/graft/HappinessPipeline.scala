package graft


import org.apache.spark.sql.functions._

import graft.analytics.{Kpis, Stats}
import graft.etl.{Clean, Normalize}
import graft.ml.Ols

/** End-to-end reference-parity pipeline as a runnable entry point:
  * 5 divergent CSVs → normalize/unify → clean → split → OLS fit →
  * score → KPIs — the reference's whole batch path
  * (`src/etl.py` + `src/train_model.py` + the warehouse KPI SQL) in one
  * lazy Spark job graph.
  *
  * Usage: runMain graft.HappinessPipeline [dataDir]
  */
object HappinessPipeline {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/reference/data")
    val spark = Sessions.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]", 8,
      "happiness-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val unified = Normalize.loadUnified(spark, dataDir).cache()
    val clean = Clean.dropNulls(unified, Normalize.Canonical)
    println(s"unified=${unified.count()} clean=${clean.count()} " +
      s"countries=${unified.select("Country").distinct().count()}")

    val (model, scored) = Ols.fitAndScore(
      clean, Normalize.Features, Normalize.Target, Seq("Country", "Year"))
    println(f"intercept=${model.intercept}%.6f coef=" +
      model.features.zip(model.coef)
        .map { case (f, c) => f"$f=$c%.5f" }.mkString(", "))

    println("== test-fold KPIs (n / MAE / RMSE / R²) ==")
    Kpis.regressionMetrics(scored.filter(col("is_test") === 1),
      col("y_true"), col("y_pred")).show(false)

    println("== KPIs by year ==")
    Kpis.groupedMetrics(scored.filter(col("is_test") === 1), Seq("Year"),
      col("y_true"), col("y_pred")).orderBy("Year").show(false)

    println("== top-5 worst errors ==")
    Kpis.topKErrors(scored, col("y_true"), col("y_pred"), 5,
      Seq(col("Country"), col("Year")))
      .select("Country", "Year", "y_true", "y_pred", "abs_error").show(false)

    println("== feature correlations vs target ==")
    Stats.topCorrelations(clean, Normalize.Features, Normalize.Target).show(false)

    spark.stop()
  }
}

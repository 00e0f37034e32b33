package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.analytics.Views
import graft.etl.{Clean, Normalize}
import graft.ml.{Ols, Scalers}
import graft.sources.Sources

class SourcesScalersSpec extends SparkSpec {
  import spark.implicits._

  test("model artifact JSON round-trip (S8) — including quoted names") {
    val m = Ols.Model(Seq("GDP per capita", "a\"quoted\"col"),
      Array(1.0396003432, -2.5), 2.2751365507577246)
    val path = Files.createTempDirectory("graft_model").resolve("m.json").toString
    Sources.saveModel(m, path)
    val back = Sources.loadModel(path)
    assert(back.features === m.features)
    assert(back.coef.toSeq === m.coef.toSeq)
    assert(back.intercept === m.intercept)
  }

  test("standardScale: mean 0, population std 1; constant column → 0") {
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "c")
    val out = Scalers.standardScale(df, Seq("x", "c"))
    val stats = out.agg(
      round(avg("x_std"), 9), round(stddev_pop("x_std"), 9),
      round(max(abs(col("c_std"))), 9)).head()
    assert(stats.getDouble(0) === 0.0)
    assert(stats.getDouble(1) === 1.0)
    assert(stats.getDouble(2) === 0.0)
  }

  test("minMaxScale maps to [0,1]") {
    val df = Seq(10.0, 20.0, 30.0).toDF("x")
    val got = Scalers.minMaxScale(df, Seq("x"))
      .select("x_mm").collect().map(_.getDouble(0)).sorted.toSeq
    assert(got === Seq(0.0, 0.5, 1.0))
  }

  test("format round-trips: parquet → orc / csv / json → identical rows") {
    import org.apache.spark.sql.functions._
    val base = Tables.load(spark, TestSpark.sf0001, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    val want = base.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    base.write.mode("overwrite").orc(s"$dir/orc")
    base.write.mode("overwrite").option("header", true).csv(s"$dir/csv")
    base.write.mode("overwrite").json(s"$dir/json")
    val orc = spark.read.orc(s"$dir/orc")
    val csv = spark.read.option("header", true)
      .schema(base.schema).csv(s"$dir/csv")
    val json = spark.read.schema(base.schema).json(s"$dir/json")
    for (df <- Seq(orc, csv, json)) {
      assert(df.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2))).toSet === want)
    }
  }

  test("reference SQL views over predictions (kpis_globales etc.)") {
    val unified = Clean.dropNulls(
      Normalize.loadUnified(spark, TestSpark.refData), Normalize.Canonical)
    val (_, scored) = Ols.fitAndScore(
      unified, Normalize.Features, Normalize.Target, Seq("Country", "Year"))
    val predictions = scored.select(
      col("Country").as("country"), col("Year").as("year"),
      col("y_true"), col("y_pred"), col("is_train"), col("is_test"))
    Views.register(spark, predictions)
    val g = spark.sql("SELECT * FROM kpis_globales").head()
    assert(g.getAs[Long]("n") > 200)
    assert(g.getAs[Double]("r2") > 0.6 && g.getAs[Double]("r2") < 0.9)
    assert(spark.sql("SELECT * FROM kpis_por_anio").count() === 5)
    val top = spark.sql("SELECT * FROM top10_peores_errores").collect()
    assert(top.length === 10)
    // descending abs_error
    val errs = top.map(_.getAs[Double]("abs_error")).toSeq
    assert(errs === errs.sorted.reverse)
  }
}

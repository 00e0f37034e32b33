package graft

import org.apache.spark.sql.functions._

import graft.etl.{Clean, Normalize}
import graft.analytics.Kpis
import graft.ml.Ols

/** Golden end-to-end parity test on the reference's real CSVs
  * (SURVEY.md §5 test plan #2): every invariant below was verified
  * against the reference during the survey (SURVEY §6 / BASELINE.md).
  */
class HappinessEtlSpec extends SparkSpec {

  lazy val unified = Normalize.loadUnified(spark, TestSpark.refData).cache()

  test("unified dataset has 782 rows (158+157+155+156+156 per year)") {
    assert(unified.count() === 782)
    val perYear = unified.groupBy("Year").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perYear === Map(2015 -> 158L, 2016 -> 157L, 2017 -> 155L,
      2018 -> 156L, 2019 -> 156L))
  }

  test("canonical schema: 8 columns in fixed order") {
    assert(unified.columns.toSeq === Normalize.Canonical)
  }

  test("exactly 1 null cell — the 2018 'N/A' corruption value (UAE)") {
    val nullCounts = Normalize.Canonical.map(c =>
      c -> unified.filter(col(c).isNull).count()).toMap
    assert(nullCounts.values.sum === 1)
    assert(nullCounts("Perceptions of corruption") === 1)
    val row = unified.filter(col("Perceptions of corruption").isNull)
      .select("Country", "Year").head()
    assert(row.getInt(1) === 2018)
    assert(row.getString(0) === "United Arab Emirates")
  }

  test("781 rows after dropna; 170 distinct countries; unique (Country, Year)") {
    val clean = Clean.dropNulls(unified, Normalize.Canonical)
    assert(clean.count() === 781)
    assert(unified.select("Country").distinct().count() === 170)
    assert(unified.groupBy("Country", "Year").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("deterministic split: reproducible, disjoint, ~70/30") {
    val clean = Clean.dropNulls(unified, Normalize.Canonical)
    val a = Ols.withSplitFlags(clean, Seq("Country", "Year"))
    val b = Ols.withSplitFlags(clean, Seq("Country", "Year"))
    // re-derivable across independent plans (the property the reference
    // relies on when producer re-derives the trainer's split)
    assert(a.filter(col("is_train") === 1).count() ===
      b.filter(col("is_train") === 1).count())
    assert(a.filter(col("is_train") + col("is_test") =!= 1).count() === 0)
    val trainFrac = a.filter(col("is_train") === 1).count().toDouble / 781
    assert(trainFrac > 0.62 && trainFrac < 0.78, s"train fraction $trainFrac")
  }

  test("OLS fit + score end-to-end: metrics in the verified ballpark") {
    val clean = Clean.dropNulls(unified, Normalize.Canonical)
    val (model, scored) = Ols.fitAndScore(
      clean, Normalize.Features, Normalize.Target, Seq("Country", "Year"))
    // coefficient signs/magnitudes must match the verified model
    // (BASELINE.md: gdp 1.04, social 0.61, health 1.07, freedom 1.72,
    //  corrupt 1.15, intercept 2.28) — split differs, so tolerance is wide
    assert(model.intercept > 1.5 && model.intercept < 3.0)
    assert(model.coef.forall(c => c > 0.2 && c < 2.6))
    val m = Kpis.regressionMetrics(
      scored.filter(col("is_test") === 1), col("y_true"), col("y_pred")).head()
    val r2 = m.getAs[Double]("r2")
    val mae = m.getAs[Double]("mae")
    // verified reference test metrics: R² 0.7475, MAE 0.4351
    assert(r2 > 0.6 && r2 < 0.9, s"r2 $r2")
    assert(mae > 0.3 && mae < 0.6, s"mae $mae")
  }

  test("feature–target correlation ordering matches the reference EDA") {
    val clean = Clean.dropNulls(unified, Normalize.Canonical)
    val order = graft.analytics.Stats
      .topCorrelations(clean, Normalize.Features, Normalize.Target)
      .collect().map(_.getString(0)).toSeq
    // verified on the reference data: GDP > health > social > freedom > corruption
    assert(order === Seq("GDP per capita", "Healthy life expectancy",
      "Social support", "Freedom", "Perceptions of corruption"))
  }

  test("ETL is input-order invariant (union-normalize commutes)") {
    val reversed = Normalize.loadUnified(spark, TestSpark.refData, (2015 to 2019).reverse)
    assert(reversed.count() === 782)
    val a = unified.groupBy("Year").agg(round(sum("Happiness Score"), 6).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val b = reversed.groupBy("Year").agg(round(sum("Happiness Score"), 6).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }
}

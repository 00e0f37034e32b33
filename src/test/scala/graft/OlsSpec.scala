package graft

import org.apache.spark.sql.functions._

import graft.ml.Ols

class OlsSpec extends SparkSpec {
  import spark.implicits._

  test("normal-equations fit recovers exact coefficients on noiseless data") {
    // y = 2 + 3a − 1.5b, exact — closed-form OLS must recover it
    val rows = for (a <- 0 until 20; b <- 0 until 5)
      yield (a.toDouble, b.toDouble, 2.0 + 3.0 * a - 1.5 * b)
    val df = rows.toDF("a", "b", "y")
    val m = Ols.fit(df, Seq("a", "b"), "y")
    assert(math.abs(m.intercept - 2.0) < 1e-8)
    assert(math.abs(m.coef(0) - 3.0) < 1e-8)
    assert(math.abs(m.coef(1) + 1.5) < 1e-8)
  }

  test("scoring expression equals dot product + intercept") {
    val m = Ols.Model(Seq("a", "b"), Array(3.0, -1.5), 2.0)
    val got = Seq((4.0, 2.0)).toDF("a", "b")
      .select(m.scoreExpr.as("p")).head().getDouble(0)
    assert(math.abs(got - (2.0 + 12.0 - 3.0)) < 1e-12)
  }

  test("fit matches least squares on noisy overdetermined system") {
    // noise via deterministic hash so the test is reproducible
    val rows = (0 until 500).map { i =>
      val a = i % 23; val b = (i * 7) % 11
      val noise = ((i * 2654435761L) % 1000) / 1000.0 - 0.5
      (a.toDouble, b.toDouble, 1.0 + 0.5 * a + 2.0 * b + noise)
    }
    val df = rows.toDF("a", "b", "y")
    val m = Ols.fit(df, Seq("a", "b"), "y")
    assert(math.abs(m.coef(0) - 0.5) < 0.05)
    assert(math.abs(m.coef(1) - 2.0) < 0.05)
    assert(math.abs(m.intercept - 1.0) < 0.3)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.Tables

/** Cardinality sketches: the HLL production path (engine-specific, so
  * never oracle-hashed) and the KMV estimator behind q43. */
class SetOpsSpec extends SparkSpec {

  private def li = Tables.load(spark, TestSpark.sf0001, "lineitem")

  test("approx_count_distinct (HLL++) lands within its error bound") {
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.05).as("hll")).head()
    val exact = r.getLong(0).toDouble
    val hll = r.getLong(1).toDouble
    // 0.05 is the requested relative standard deviation; 4 sigma margin
    assert(math.abs(hll - exact) / exact < 0.2, s"hll=$hll exact=$exact")
  }

  test("percentile_approx (the huge-scale quantile path) lands near exact") {
    val r = li.agg(
      expr("percentile(l_quantity, 0.5)").as("exact"),
      expr("percentile_approx(l_quantity, 0.5, 1000)").as("approx")).head()
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    assert(math.abs(approx - exact) <= math.max(1.0, exact * 0.05),
      s"approx=$approx exact=$exact")
  }

  test("KMV estimate (q43) tracks exact distinct") {
    val row = queries.SetOps.q43_approx_distinct(spark, TestSpark.sf0001).head()
    val exact = row.getAs[Long]("exact_parts").toDouble
    val kmv = row.getAs[Double]("kmv_parts")
    // k=64 → relative sd ≈ 1/sqrt(k-2) ≈ 0.127; allow 4 sigma
    assert(math.abs(kmv - exact) / exact < 0.51, s"kmv=$kmv exact=$exact")
  }
}

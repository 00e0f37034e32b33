package graft

import org.apache.spark.sql.functions._

/** Sketch rollup — the incremental-maintenance pattern for DISTINCT
  * counts (the [[graft.analytics.Drift]] moment-state discipline
  * applied to cardinality): build one HLL sketch per day partition,
  * union them into the month. HLL union is register-wise max, so the
  * merged sketch is IDENTICAL to the sketch built directly over the
  * whole range — the daily partials can be stored and re-rolled
  * without ever rescanning history. At 100 TB this is the difference
  * between an O(day) incremental job and an O(corpus) recount.
  *
  * Uses Spark 4's built-in DataSketches functions (hll_sketch_agg /
  * hll_union_agg / hll_sketch_estimate) — no custom code needed, which
  * is the point: prefer the codegen'd built-in over a UDAF.
  */
class SketchRollupSpec extends SparkSpec {
  import spark.implicits._

  test("daily HLL sketches union to exactly the direct whole-range sketch") {
    val events = Tables.load(spark, TestSpark.sf0001, "events")
      .withColumn("day", to_date(col("ts")))

    val daily = events.groupBy("day")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val merged = daily
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .as[Long].head()
    val direct = events
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
      .as[Long].head()
    assert(merged === direct,
      "register-wise max union must reproduce the direct sketch")

    val exact = events.select(countDistinct("user_id")).as[Long].head()
    val err = math.abs(merged - exact).toDouble / exact
    assert(err < 0.05, s"HLL estimate $merged vs exact $exact (err $err)")
  }

  test("sketch column is mergeable across arbitrary repartitioning") {
    val events = Tables.load(spark, TestSpark.sf0001, "events")
    val a = events.repartition(13)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))")).as[Long].head()
    val b = events.repartition(1)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))")).as[Long].head()
    assert(a === b, "estimate must not depend on physical partitioning")
  }

  test("CountMin: estimates never undercount, exact when collision-free") {
    val df = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(2)("c") ++
      Seq("d")).toDF("x")
    // narrow sketch: collisions likely, but one-sided error guaranteed
    val narrow = graft.sketch.CountMin.sketch(df, col("x"), depth = 4, width = 2)
    val items = Seq(("a", 10L), ("b", 5L), ("c", 2L), ("d", 1L), ("zz", 0L))
      .toDF("x", "exact_n")
    val narrowEst = graft.sketch.CountMin
      .estimate(narrow, items, col("x"), depth = 4, width = 2)
      .select(col("x"), col("exact_n"), col("cms_n"))
      .as[(String, Long, Long)].collect()
    narrowEst.foreach { case (x, exact, cms) =>
      assert(cms >= exact, s"undercount for $x: $cms < $exact")
    }
    // wide sketch: 4 independent rows over width 64 for 4 keys ->
    // min over rows recovers the exact counts
    val wide = graft.sketch.CountMin.sketch(df, col("x"), depth = 4, width = 64)
    val wideEst = graft.sketch.CountMin
      .estimate(wide, items, col("x"), depth = 4, width = 64)
      .select(col("x"), col("exact_n"), col("cms_n"))
      .as[(String, Long, Long)].collect()
    wideEst.foreach { case (x, exact, cms) => assert(cms === exact, x) }
  }

  test("CountMin: sketches of disjoint halves merge cell-wise to the whole") {
    val a = Seq("x", "x", "y").toDF("v")
    val b = Seq("x", "y", "z").toDF("v")
    val whole = graft.sketch.CountMin.sketch(a.union(b), col("v"), 4, 16)
      .orderBy("row_i", "bucket").as[(Int, Long, Long)].collect()
    val merged = graft.sketch.CountMin.sketch(a, col("v"), 4, 16)
      .union(graft.sketch.CountMin.sketch(b, col("v"), 4, 16))
      .groupBy("row_i", "bucket").agg(sum("c").as("c"))
      .orderBy("row_i", "bucket").as[(Int, Long, Long)].collect()
    assert(whole === merged)
  }
}

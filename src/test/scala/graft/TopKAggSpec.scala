package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.TopKAgg

/** Bounded-heap per-group top-k aggregate: equivalence with the window
  * formulation, the partial/merge path, and tie determinism. */
class TopKAggSpec extends SparkSpec {

  test("top_k_ids ≡ window row_number formulation (many partitions → merge path)") {
    import spark.implicits._
    // 40 groups × 500 rows, deliberately re-shuffled into 16 partitions
    // so partial buffers must serialize + merge across tasks
    val df = spark.range(20000)
      .select((col("id") % 40).as("g"),
        (pmod(col("id") * 2654435761L, lit(99991L))).cast("double").as("s"),
        col("id"))
      .repartition(16)
    val viaAgg = df.groupBy("g")
      .agg(TopKAgg.top_k_ids(col("s"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("i", "e")))
      .select($"g", ($"i" + 1).as("rn"), $"e.id".as("id"), $"e.score".as("s"))
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w).cast("int") - 0)
      .filter(col("rn") <= 5)
      .select($"g", $"rn".cast("int").as("rn"), $"id", $"s")
    assert(viaAgg.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet ===
      viaWindow.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet)
  }

  test("score ties break to the lower id, null scores are skipped") {
    import spark.implicits._
    val df = Seq((1L, Some(5.0), 10L), (1L, Some(5.0), 7L), (1L, None, 1L),
      (1L, Some(9.0), 3L)).toDF("g", "s", "id")
    val top = df.groupBy("g")
      .agg(TopKAgg.top_k_ids(col("s"), col("id"), 2).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.score"), col("e.id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toList
    assert(top === List((9.0, 3L), (5.0, 7L)))
  }

  test("registered SQL form works") {
    GraftExtensions.register(TestSpark.spark)
    spark.range(10).select((col("id") % 2).as("g"),
        col("id").cast("double").as("s"), col("id"))
      .createOrReplaceTempView("tk")
    val rows = spark.sql(
      "SELECT g, top_k_ids(s, id, 2) AS top FROM tk GROUP BY g ORDER BY g")
      .select(col("g"), col("top")(0).getField("id").as("best"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(rows === List((0L, 8L), (1L, 9L)))
  }

  // ------------------------------------------------------- Misra–Gries

  test("heavy hitters: every key above N/(k+1) survives with bounded undercount") {
    import spark.implicits._
    // 1000 rows: key 1 ×400, key 2 ×300, keys 3..102 ×3 each
    val rows = Seq.fill(400)(1L) ++ Seq.fill(300)(2L) ++
      (3L to 102L).flatMap(k => Seq.fill(3)(k))
    val df = rows.toDF("key").repartition(8) // force partial + merge path
    val k = 9
    val out = df.agg(graft.expressions.MisraGriesAgg
        .heavy_hitters(col("key"), k).as("hh"))
      .selectExpr("explode(hh) AS h").select("h.key", "h.lower")
      .as[(Long, Long)].collect().toMap
    val n = rows.size
    assert(out.contains(1L) && out.contains(2L)) // true count > N/(k+1) = 100
    assert(out.size <= k)
    // lower bounds never overstate and undershoot by at most N/(k+1)
    assert(out(1L) <= 400L && out(1L) >= 400L - n / (k + 1))
    assert(out(2L) <= 300L && out(2L) >= 300L - n / (k + 1))
  }

  test("heavy hitters: the hot key survives under every partitioning") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (i % 7).toLong) ++ Seq.fill(200)(42L)
    def run(parts: Int) = rows.toDF("key").repartition(parts)
      .agg(graft.expressions.MisraGriesAgg.heavy_hitters(col("key"), 4).as("hh"))
      .selectExpr("explode(hh) AS h").select("h.key")
      .as[Long].collect().toSet
    assert(run(1).contains(42L))
    assert(run(5).contains(42L))
    assert(run(32).contains(42L))
  }

  test("heavy_hitters from SQL with a literal k") {
    GraftExtensions.register(TestSpark.spark)
    // skewed keys: 0 dominates (901 of 999 rows) and must be reported
    val hot = spark.sql(
      "SELECT explode(heavy_hitters(greatest(id - 900, 0), 2)) AS h " +
        "FROM range(0, 999)")
      .selectExpr("h.key").collect().map(_.getLong(0)).toSet
    assert(hot.contains(0L))
  }
}

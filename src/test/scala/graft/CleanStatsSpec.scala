package graft

import org.apache.spark.sql.functions._

import graft.analytics.Stats
import graft.etl.Clean

class CleanStatsSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = Seq(
    ("a", Some(1.0), 10.0), ("b", Some(2.0), 20.0), ("c", Some(3.0), 30.0),
    ("d", Some(4.0), 40.0), ("e", None, 50.0), ("f", Some(100.0), 60.0)
  ).toDF("k", "x", "y")

  test("dropNulls drops exactly the null-bearing rows") {
    assert(Clean.dropNulls(df, Seq("x", "y")).count() === 5)
  }

  test("nullCensus counts nulls per column, descending") {
    val rows = Clean.nullCensus(df, Seq("x", "y")).collect()
    assert(rows.head.getString(0) === "x" && rows.head.getLong(1) === 1L)
    assert(rows(1).getString(0) === "y" && rows(1).getLong(1) === 0L)
  }

  test("winsorize clips to the quantile fences and preserves rows") {
    val w = Clean.winsorize(df, Seq("x"), 0.1, 0.9)
    assert(w.count() === df.count())
    val stats = w.agg(max("x"), min("x")).head()
    assert(stats.getDouble(0) < 100.0) // clipped down
    assert(stats.getDouble(1) >= 1.0)
  }

  test("iqrFilter removes the outlier, keeps nulls (null-pass semantics)") {
    val kept = Clean.iqrFilter(df, Seq("x"))
    val keys = kept.select("k").collect().map(_.getString(0)).toSet
    assert(!keys.contains("f")) // 100.0 is outside the fences
    assert(keys.contains("e")) // null passes
  }

  test("zscoreFilter drops |z| > k rows (population stddev)") {
    val kept = Clean.zscoreFilter(df, Seq("x"), 1.5)
    assert(!kept.select("k").collect().map(_.getString(0)).contains("f"))
  }

  test("iqrOutlierCensus reports per-feature outlier counts") {
    val row = Clean.iqrOutlierCensus(df, Seq("x")).head()
    assert(row.getAs[String]("feature") === "x")
    assert(row.getAs[Long]("n_outliers") === 1L)
  }

  test("iqrOutlierCensusBy: fences computed within groups") {
    val d = ((1 to 20).map(i => ("g1", i.toDouble)) ++
      Seq(("g1", 1000.0)) ++ (1 to 20).map(i => ("g2", i * 100.0))).toDF("g", "x")
    val census = Clean.iqrOutlierCensusBy(d, Seq("x"), Seq("g"))
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("n_outliers")).toMap
    assert(census("g1") === 1L) // 1000.0 is an outlier within g1
    assert(census("g2") === 0L) // g2's scale is its own baseline
  }

  test("corrMatrix: perfectly correlated columns → corr 1.0") {
    val d = (1 to 50).map(i => (i.toDouble, 2.0 * i, -3.0 * i)).toDF("a", "b", "c")
    val m = Stats.corrMatrix(d, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("a", "b")) === 1.0)
    assert(m(("a", "c")) === -1.0)
  }

  test("describe: exact interpolating quartiles match pandas semantics") {
    val d = (1 to 5).map(_.toDouble).toDF("v") // q25 of 1..5 = 2.0 (linear interp)
    val row = Stats.describe(d, Seq("v")).head()
    assert(row.getAs[Double]("q25") === 2.0)
    assert(row.getAs[Double]("q50") === 3.0)
    assert(row.getAs[Double]("q75") === 4.0)
    assert(row.getAs[Double]("std_pop") === 1.414214) // ddof=0, 6dp-rounded
  }

  test("withZScores standardizes with population stddev") {
    val d = Seq(1.0, 2.0, 3.0).toDF("v")
    val z = Stats.withZScores(d, Seq("v")).agg(round(sum("z_v"), 9)).head().getDouble(0)
    assert(z === 0.0)
  }

  test("groupedPercentilesExact ≡ Spark percentile, bit-for-bit (no 6dp mercy)") {
    // random-ish doubles with DUPLICATES and skewed group sizes, probed
    // at percentiles that land on integral ranks, mid-run ranks, and
    // interpolated positions — the distributed-rank construction must
    // reproduce the buffered aggregate's exact doubles, since q13/q64/
    // q83/q221 were re-pointed onto it with their oracles unchanged
    val ps = Seq(0.0, 0.01, 0.25, 0.37, 0.5, 0.75, 0.99, 1.0)
    var s = 12345L
    val rows = (1 to 4000).map { i =>
      s = s * 6364136223846793005L + 1442695040888963407L
      val g = s"g${math.floorMod(s, 7)}"      // 7 groups, uneven
      s = s * 6364136223846793005L + 1442695040888963407L
      val v = math.floorMod(s >>> 20, 500).toDouble / 7.0  // ties guaranteed
      (g, v)
    } :+ (("solo", 42.0))                      // n = 1 group
    val df = rows.toDF("g", "v")
    val viaBuffer = df.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // the adaptive entry point (small frame → the fold path)
    val viaRank = Stats.groupedPercentilesExact(df, col("g"), col("v"), ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    assert(viaRank.size === viaBuffer.size * ps.size)
    for ((g, qs) <- viaBuffer; (p, i) <- ps.zipWithIndex)
      assert(viaRank((g, p)) === qs(i),
        s"group $g p=$p: rank construction ${viaRank((g, p))} != buffered ${qs(i)}")
    // and the BUCKETED path, forced explicitly — the round-11 adaptive
    // gate must leave both constructions bit-identical to `percentile`
    val base = df.select(col("g").as("grp"), col("v").cast("double").as("v"))
      .filter(col("v").isNotNull)
    val comp = base.groupBy("grp", "v").agg(count(lit(1)).as("c"))
    val viaBuckets = Stats
      .fromCountsWithBounds(comp, ps, Stats.sketchBounds(base, 8))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    for ((g, qs) <- viaBuffer; (p, i) <- ps.zipWithIndex)
      assert(viaBuckets((g, p)) === qs(i),
        s"group $g p=$p: bucketed ${viaBuckets((g, p))} != buffered ${qs(i)}")
    // and the plan carries no Percentile aggregate — the whole point
    val plan = Stats.groupedPercentilesExact(df, col("g"), col("v"), ps)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("percentile"), s"expected no percentile agg:\n$plan")
  }

  test("adaptive gate: small frames fold (no window/sketch), big frames bucket") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // small: a local frame well under the 8 MB estimate → the fold
    // plan, which must carry NO window (and NO single-partition window
    // shape for a constant group key — PlanAuditSpec's fleet rule)
    val small = (1 to 1000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val smallPlan = Stats
      .groupedPercentilesExact(small, lit(1), col("v"), Seq(0.5))
      .queryExecution.optimizedPlan
    assert(smallPlan.collect { case w: LWindow => w }.isEmpty,
      s"fold path must not window:\n$smallPlan")
    // big: spark.range(3M) estimates ~24 MB > the 8 MB gate → the
    // range-bucketed construction (window keyed on (grp, bucket))
    val big = spark.range(3000000).select(
      (col("id") % 7).as("g"), col("id").cast("double").as("v"))
    val bigPlan = Stats
      .groupedPercentilesExact(big, col("g"), col("v"), Seq(0.5))
      .queryExecution.optimizedPlan
    assert(bigPlan.collect { case w: LWindow => w }.nonEmpty,
      s"large input must take the bucketed construction:\n$bigPlan")
    // and the fold path agrees with the bucketed path on the same data
    val base = small.select(lit(1).as("grp"), col("v"))
    val comp = base.groupBy("grp", "v").agg(count(lit(1)).as("c"))
    val fold = Stats.foldPercentilesFromCounts(comp, Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val bucketed = Stats
      .fromCountsWithBounds(comp, Seq(0.25, 0.5, 0.75),
        Stats.sketchBounds(base, 8))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(fold === bucketed)
  }

  test("percentilesFromCounts: few buckets, one bucket, struct group keys") {
    // bucket count must not change results (it only balances the sort);
    // forced through the bucketed construction — the adaptive public
    // entry would fold a frame this small
    val d = (1 to 100).map(i => ("k", i % 10, (i * 37 % 100).toDouble))
      .toDF("a", "b", "v")
    val comp = d.groupBy(struct(col("a"), col("b")).as("grp"), col("v"))
      .agg(count(lit(1)).as("c"))
    val r32 = Stats
      .fromCountsWithBounds(comp, Seq(0.5), Stats.sketchBounds(comp, 32))
      .collect().map(r => r.getStruct(0).toString -> r.getDouble(2)).toMap
    val r1 = Stats.fromCountsWithBounds(comp, Seq(0.5), Array.empty)
      .collect().map(r => r.getStruct(0).toString -> r.getDouble(2)).toMap
    assert(r32 === r1 && r32.size === 10)
    // the adaptive entry (fold, struct keys) agrees with both
    val rf = Stats.percentilesFromCounts(comp, Seq(0.5))
      .collect().map(r => r.getStruct(0).toString -> r.getDouble(2)).toMap
    assert(rf === r32)
  }

  test("bucket-tree plan ≡ unbucketed plan on values AT every boundary (+NaN)") {
    import spark.implicits._
    // fromCountsWithBounds assigns buckets through a balanced when-tree
    // (|{i : bounds(i) <= v}| in log(b) comparisons). Its one risk is an
    // off-by-one at a boundary: pin result equality against the
    // single-bucket plan over values sitting exactly ON each bound,
    // just around them, at the extremes, and NaN (GREATER than every
    // other double under Spark's SQL ordering, so `v >= bound` holds
    // at every node -> the LAST bucket, same as the old
    // summed-indicator chain where all b indicators fire)
    val bounds = Array(10.0, 20.0, 30.0, 40.0, 55.0, 70.0, 85.0)
    val vs = Seq(Double.NaN, -5.0, 0.0, 9.999, 10.0, 10.001, 19.9, 20.0,
      25.0, 30.0, 39.0, 40.0, 41.0, 55.0, 69.0, 70.0, 84.0, 85.0, 1e9)
    val comp = vs.toDF("v").select(lit("g").as("grp"), col("v"), lit(1L).as("c"))
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    def run(bs: Array[Double]) =
      Stats.fromCountsWithBounds(comp, ps, bs)
        .collect()
        // bit-compare so the NaN the max-rank percentile inherits from
        // the input still counts as equal (NaN != NaN under ===)
        .map(r => r.getDouble(1) ->
          java.lang.Double.doubleToLongBits(r.getDouble(2))).toMap
    assert(run(bounds) === run(Array.empty))
  }

  test("equi-depth histogram: ntile semantics with ties straddling boundaries") {
    import spark.implicits._
    // 11 values, 3 buckets -> sizes 4,4,3 (first N mod b take the extra);
    // sorted: 1,1,1,2 | 2,3,3,3 | 3,4,5 — ties 2 and 3 straddle cuts
    val d = Seq(1, 1, 1, 2, 2, 3, 3, 3, 3, 4, 5).toDF("v")
    val rows = Stats.equiDepthHistogram(d, col("v"), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows === Array(
      (0L, 4L, 1.0, 2.0),
      (1L, 4L, 2.0, 3.0),
      (2L, 3L, 3.0, 5.0)))
    // buckets partition the rows
    assert(rows.map(_._2).sum === 11L)
  }
}

package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Descriptive statistics (SURVEY.md §2.4 A6–A12): summary stats, exact
  * quantiles, z-scores, pairwise correlation — the reference's EDA
  * surface. Each is a small number of aggregate passes; correlation is
  * one aggregate computing all pairs (no per-pair jobs).
  */
object Stats {

  /** Melt `cols` to a tall (feature, v-as-double) frame — one scan
    * serves every per-column statistic below and in
    * [[graft.etl.Clean]]'s censuses. */
  private[graft] def meltToDouble(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stackExpr = s"stack(${cols.size}, " +
      cols.map(c => s"'${c.replace("'", "''")}', CAST(`$c` AS DOUBLE)")
        .mkString(", ") + ") AS (feature, v)"
    df.selectExpr(stackExpr)
  }

  /** Per-column exact quantiles as a single broadcastable row:
    * `__q<i>_<col>` for each requested percentile index × column, from
    * ONE melted compressed pass through [[percentilesFromCounts]] —
    * the shared fence builder behind describe / winsorize / iqrFilter,
    * replacing their per-column `percentile` buffers (the q221 scale
    * fix applied to the whole family). */
  private[graft] def columnQuantilesRow(df: DataFrame, cols: Seq[String],
                                        ps: Seq[Double]): DataFrame = {
    val tall = meltToDouble(df, cols)
    val comp = tall.filter(col("v").isNotNull)
      .groupBy(col("feature").as("grp"), col("v")).agg(count(lit(1)).as("c"))
    val qs = percentilesFromCounts(comp, ps)
    val aggs = cols.flatMap { c =>
      ps.zipWithIndex.map { case (p, i) =>
        min(when(col("grp") === c && col("p") === p, col("q")))
          .as(s"__q${i}_$c")
      }
    }
    qs.agg(aggs.head, aggs.tail: _*)
  }

  /** describe(): count/mean/stddev/min/max per column, exact quartiles
    * (pandas-interpolation-compatible, A6/A8) — quartiles through the
    * distributed-rank construction ([[groupedPercentilesExact]], q225),
    * moments in one melted aggregate: two passes total for ANY number
    * of columns, no per-column value buffer. */
  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    val tall = meltToDouble(df, cols)
    val moments = tall.groupBy(col("feature").as("column"))
      .agg(count(col("v")).as("count"),
        round(avg(col("v")), 6).as("mean"),
        round(stddev_pop(col("v")), 6).as("std_pop"),
        round(min(col("v")), 6).as("min"),
        round(max(col("v")), 6).as("max"))
    val comp = tall.filter(col("v").isNotNull)
      .groupBy(col("feature").as("grp"), col("v")).agg(count(lit(1)).as("c"))
    val quartiles = percentilesFromCounts(comp, Seq(0.25, 0.50, 0.75))
      .groupBy(col("grp").as("column"))
      .agg(round(min(when(col("p") === 0.25, col("q"))), 6).as("q25"),
        round(min(when(col("p") === 0.50, col("q"))), 6).as("q50"),
        round(min(when(col("p") === 0.75, col("q"))), 6).as("q75"))
    moments.join(quartiles, Seq("column"), "left")
      .select("column", "count", "mean", "std_pop", "min", "q25", "q50",
        "q75", "max")
      .orderBy("column")
  }

  /** z-score columns (population stddev — pandas ddof=0, A7). */
  def withZScores(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      avg(col(c)).as(s"__m_$c"), stddev_pop(col(c)).as(s"__s_$c")))
    val moments = df.agg(aggs.head, aggs.tail: _*)
    val withZ = cols.foldLeft(df.crossJoin(broadcast(moments))) { (d, c) =>
      d.withColumn(s"z_$c", (col(c) - col(s"__m_$c")) / col(s"__s_$c"))
    }
    withZ.drop(cols.flatMap(c => Seq(s"__m_$c", s"__s_$c")): _*)
  }

  /** Full pairwise Pearson correlation matrix in ONE aggregate pass
    * (A11): tall (col_a, col_b, corr) output, col_a < col_b. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 6).as(s"${a}__$b")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) =>
      s"'${a}', '${b}', `${a}__$b`"
    }.mkString(", ")
    row.selectExpr(s"stack(${pairs.size}, $stacked) AS (col_a, col_b, corr)")
      .orderBy("col_a", "col_b")
  }

  /** Top-k strongest correlations against a target column (A12). */
  def topCorrelations(df: DataFrame, cols: Seq[String], target: String,
                      k: Int = 10): DataFrame =
    corrMatrix(df, cols :+ target)
      .filter(col("col_a") === target || col("col_b") === target)
      .withColumn("feature",
        when(col("col_a") === target, col("col_b")).otherwise(col("col_a")))
      .select("feature", "corr")
      .orderBy(abs(col("corr")).desc, col("feature").asc)
      .limit(k)

  /** Exact interpolated percentiles per group from a PRE-COMPRESSED
    * `(grp, v, c)` frame — the 100 TB replacement for Spark's exact
    * `percentile` aggregate, whose per-group value BUFFER is the one
    * shape in this repo that turns into a straight OOM at scale (every
    * value of a group lands in one aggregation buffer object; q221
    * measured 412 MB shuffled into 3 such buffers at sf1). This
    * construction is [[equiDepthHistogram]]'s distributed-rank
    * discipline made reusable:
    *
    *  1. values arrive compressed to distinct `(grp, v)` with counts —
    *     the upstream groupBy gets map-side combine, so duplicated
    *     values never cross the wire twice;
    *  2. the within-group prefix sum is RANGE-BUCKETED (the q165 /
    *     `Operators.withRunningTotal` shape): an approxQuantile sketch
    *     picks ~`buckets` value split points, the per-(grp,bucket)
    *     totals make a tiny frame whose running sum yields each
    *     bucket's starting offset, and the full cumulative count is
    *     `offset + running-sum-within-bucket` — NO single partition
    *     ever holds a whole group, even when values are continuous
    *     (l_extendedprice is 97% distinct: compression alone would
    *     not save that group's sort);
    *  3. each requested percentile touches at most two compressed
    *     rows — the ones whose 1-based rank interval [s, e] covers
    *     `floor(pos)+1` / `ceil(pos)+1` for pos = p·(n−1) — and the
    *     interpolation `(ceil(pos)−pos)·v_lo + (pos−floor(pos))·v_hi`
    *     is Spark's own `Percentile.getPercentile` formula with the
    *     SAME double operation order, so results are bit-identical to
    *     `percentile(v, p)` (pinned by CleanStatsSpec), not merely
    *     close.
    *
    * `comp` must have columns `grp` (any groupable type — structs
    * work), `v` (double, non-null) and `c` (long counts ≥ 1). Returns
    * one row per group × percentile: `(grp, p, q)`. Shuffle is
    * distinct-value-sized; the only driver-side work is the
    * approxQuantile sketch (model-sized).
    *
    * Plan choice is adaptive: frames the optimizer estimates at or
    * under `maxFoldBytes` take the single-fold small path (where
    * `buckets` is irrelevant and ignored); larger frames take this
    * bucketed construction. Pass `maxFoldBytes = 0` to force the
    * bucketed scale plan regardless of estimate (q233 does, so the
    * high-cardinality offsets shape keeps continuous oracle coverage
    * at every SF), or a huge value to force the fold. Both paths are
    * bit-identical to `percentile` (CleanStatsSpec).
    *
    * `buckets = 0` (the default) auto-sizes the range-bucket count and
    * the rank sort's partition count from the frame's own estimate
    * ([[autoBuckets]]/[[autoSortParts]]); explicit values are honored
    * unchanged. Results are bucket-count-independent either way
    * (CleanStatsSpec pins buckets=1 ≡ buckets=32). */
  def percentilesFromCounts(comp: DataFrame, ps: Seq[Double],
                            buckets: Int = 0,
                            maxFoldBytes: BigInt = SmallPlanBytes): DataFrame = {
    val est = planBytes(comp)
    if (est <= maxFoldBytes) foldPercentilesFromCounts(comp, ps)
    else if (buckets > 0)
      fromCountsWithBounds(comp, ps, sketchBounds(comp, buckets),
        sortPartsFor(est, comp.sparkSession))
    else {
      val (bounds, parts) = autoSketch(comp, est)
      fromCountsWithBounds(comp, ps, bounds, parts)
    }
  }

  /** Adaptive cut-over threshold for the single-fold small path, in
    * optimizer-estimated bytes — the broadcast-join sizing discipline
    * applied to percentile planning: the decision costs ZERO actions
    * (it reads `optimizedPlan.stats.sizeInBytes`, which Spark
    * propagates through scans, projections, aggregates and
    * `localCheckpoint`), and unknown stats report huge, so anything
    * the optimizer can't bound takes the scale construction. 8 MB
    * keeps sf0.1 lineitem (~3.4 MB estimate) on the fold plan and
    * sf1 (~34 MB) on the range-bucketed one — a mis-estimate costs
    * one oversized (but still value-COMPRESSED) per-group array,
    * never correctness: both paths are pinned bit-identical to
    * Spark's `percentile` by CleanStatsSpec. */
  private[graft] val SmallPlanBytes = BigInt(8L << 20)

  private def planBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** The small-frame percentile plan: two exchanges, no sketch action,
    * no window, no broadcast — per group, the compressed `(v, c)` pairs
    * collect into ONE sorted array (bounded by [[SmallPlanBytes]]'s
    * gate — this is deliberately the "value buffer" shape, safe only
    * because the optimizer just proved the COMPRESSED frame tiny) and
    * a single `aggregate` fold walks it once, claiming the value at
    * every requested rank as the running count crosses it. Rank
    * selection and the interpolation expressions are shared with the
    * bucketed construction ([[rankExprs]]), so bit-equality with
    * `percentile` holds by the same argument. At sf0.1 this returns
    * q13 to its pre-rework sub-second shape (the bucketed plan's
    * sketch job + offsets self-join + window cost ~1.1 s of fixed
    * overhead there, measured round 11). */
  private[graft] def foldPercentilesFromCounts(comp: DataFrame,
                                               ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "percentiles must be in [0, 1]")
    val packed = comp.groupBy("grp")
      .agg(sum("c").as("__n"),
        sort_array(collect_list(struct(col("v"), col("c")))).as("__vc"))
    val zero = struct(
      lit(0L).as("cum") +:
        ps.indices.flatMap(i => Seq(
          lit(null).cast("double").as(s"vlo_$i"),
          lit(null).cast("double").as(s"vhi_$i"))): _*)
    val folded = aggregate(col("__vc"), zero, (acc, x) => {
      val cum2 = acc("cum") + x("c")
      struct(
        cum2.as("cum") +:
          ps.zipWithIndex.flatMap { case (p, i) => Seq(
            coalesce(acc(s"vlo_$i"),
              when(cum2 >= Rank.lo(p) + 1, x("v"))).as(s"vlo_$i"),
            coalesce(acc(s"vhi_$i"),
              when(cum2 >= Rank.hi(p) + 1, x("v"))).as(s"vhi_$i")) }: _*)
    })
    packed.withColumn("__f", folded)
      .select(col("grp"), explode(array(ps.zipWithIndex.map { case (p, i) =>
        struct(lit(p).as("p"),
          Rank.interp(p, col(s"__f.vlo_$i"), col(s"__f.vhi_$i")).as("q"))
      }: _*)).as("__pq"))
      .select(col("grp"), col("__pq.p").as("p"), col("__pq.q").as("q"))
  }

  /** The rank/interpolation expressions BOTH percentile plans share —
    * Spark `Percentile.getPercentile`'s exact double operation order
    * (pos = p·(n−1); floor/ceil to LONG ranks; per-term promotion in
    * the interpolation), factored so the fold path and the bucketed
    * path cannot drift apart. Expressions reference `__n`. */
  private object Rank {
    def pos(p: Double): Column = lit(p) * (col("__n") - 1)
    def lo(p: Double): Column = floor(pos(p))
    def hi(p: Double): Column = ceil(pos(p))
    def interp(p: Double, vlo: Column, vhi: Column): Column =
      when(lo(p) === hi(p), vlo)
        .otherwise((hi(p) - pos(p)) * vlo + (pos(p) - lo(p)) * vhi)
  }

  /** The range-split sketch for the bucketed prefix sum: ~`buckets`
    * approximate quantile split points of `v`, from a BOUNDED row
    * sample (first ~128k rows) rather than a full pass — split
    * placement only balances the sort, results are bound-independent
    * (pinned by CleanStatsSpec's buckets=1 ≡ buckets=32 test), so a
    * cheap, even badly skewed sample costs balance at worst, never
    * correctness, and the full-scan sketch pass was measurably as
    * expensive as the entire buffered `percentile` it replaces. */
  private val SketchSampleRows = 1 << 17

  private[graft] def sketchBounds(df: DataFrame, buckets: Int): Array[Double] =
    if (buckets <= 1) Array.empty[Double]
    else df.select("v").limit(SketchSampleRows).stat.approxQuantile("v",
      (1 until buckets).map(_.toDouble / buckets).toArray, 0.01)
      .distinct.sorted

  /** Range-bucket sizing for the bucketed construction, from the same
    * bounded sample the range sketch reads: per-group compressed bytes
    * ≈ est / (sampled distinct groups), floored so that
    * groups × buckets keeps the rank sort at ≥ 2× the session's
    * shuffle parallelism — more buckets only help when single groups
    * are BIG (for a global percentile the bucket count IS the sort
    * parallelism, and a LOW-cardinality grouped percentile without the
    * floor would collapse a 32-core sort onto n_groups tasks), while
    * at high group cardinality hash partitioning already spreads
    * groups and extra buckets just multiply the groups×buckets offsets
    * frame (the q233 shape, which this sizes down to 1 bucket).
    * Bucket-count independence of the RESULT is pinned by
    * CleanStatsSpec, so sizing is a pure balance/spill decision, never
    * correctness. */
  private[graft] def autoBuckets(est: BigInt, nGroupsSampled: Long,
                                 shuffleParts: Int): Int = {
    val n = math.max(1L, nGroupsSampled)
    val perGroup = est / BigInt(n)
    val byBytes =
      (perGroup / BucketTargetBytes).min(BigInt(MaxAutoBuckets - 1)).toInt + 1
    val byCores = ((2L * shuffleParts + n - 1) / n).toInt
    math.min(MaxAutoBuckets, math.max(byBytes, byCores))
  }

  /** Explicit partition count for the rank sort's exchange: the
    * optimizer estimate over ~256 KB per task (est bytes are the
    * COMPRESSED plan estimate; in-sort UnsafeRow + sorter overhead
    * runs an order of magnitude higher, which is why the target is
    * small) — never below the session's shuffle partitions, capped so
    * a mis-estimate can't explode the stage. This is the q233 sf1
    * sort-spill shave: 32 fixed partitions put ~35 MB of rank rows in
    * each task's sorter under a 2 GiB heap shared by 32 concurrent
    * tasks. */
  private[graft] def autoSortParts(est: BigInt,
                                   spark: SparkSession): Int = {
    val byBytes = (est / SortTargetBytes).min(BigInt(MaxSortParts)).toInt
    math.max(spark.sessionState.conf.numShufflePartitions, byBytes)
  }

  /** [[autoSortParts]] behind the [[EstSanityCap]] gate: a garbage
    * estimate keeps the session's own partitioning (0 = default). */
  private def sortPartsFor(est: BigInt, spark: SparkSession): Int =
    if (est <= EstSanityCap) autoSortParts(est, spark) else 0

  private val BucketTargetBytes = BigInt(4L << 20)
  private val SortTargetBytes = BigInt(256L << 10)
  private val MaxAutoBuckets = 256
  private val MaxSortParts = 4096

  /** Estimates beyond any physical plausibility are cardinality-
    * explosion garbage, not sizes — q221's deviation frame reports
    * ~10²² bytes because `localCheckpoint` preserves the ORIGIN plan's
    * stats and a percentile-join lineage multiplies cardinalities.
    * Auto-sizing on such a number would buy the maximum caps (256
    * buckets × 4096 sort partitions) for a frame that is actually a
    * few dozen MB. Past this cap the estimate is ignored: buckets fall
    * back to the parallelism floor and the rank sort keeps the
    * SESSION's partitioning — i.e. exactly the knobs a real deployment
    * states explicitly. */
  private val EstSanityCap = BigInt(1L << 40)

  /** Range-bucket assignment `|{i : bounds(i) ≤ v}|` as a BALANCED
    * `when` tree over the sorted distinct bounds — log₂(b) comparisons
    * per row where the naive summed-indicator chain costs b (measured:
    * the 255-bound chain put 1.5G extra comparisons on q221's sf1
    * deviation frame — 67 s vs 10 s). CaseWhen evaluates only the
    * taken branch, so the tree IS the binary search; NaN is GREATER
    * than every other double under Spark's SQL ordering, so `v ≥
    * bound` holds at every node and NaN lands in the LAST bucket —
    * exactly like the chain, where all b indicators fire. */
  private def bucketOf(bounds: Array[Double]): Column = {
    def tree(lo: Int, hi: Int): Column =
      if (lo == hi) lit(lo)
      else {
        val mid = (lo + hi + 1) / 2 // bucket mid starts at bounds(mid-1)
        when(col("v") >= bounds(mid - 1), tree(mid, hi))
          .otherwise(tree(lo, mid - 1))
      }
    tree(0, bounds.length)
  }

  /** The auto path's ONE sizing action — the same bounded sample the
    * round-11 sketch read, but collected once so it prices everything:
    * sampled distinct-group count → bucket count ([[autoBuckets]]),
    * exact sample quantiles → the range split points (split placement
    * only balances the sort — results are bounds-independent, pinned
    * by CleanStatsSpec), and the estimate → the rank sort's explicit
    * partition count ([[autoSortParts]]). One action, not a sketch
    * action PLUS a distinct-count action: on derived frames every
    * extra action re-runs the compressed-frame lineage (`Clean.mad`
    * calls this twice per query). The sample is ≤ [[SketchSampleRows]]
    * (grp-as-string, v) rows — bounded, model-sized driver state. */
  private def autoSketch(df: DataFrame,
                         est: BigInt): (Array[Double], Int) = {
    val spark = df.sparkSession
    val shuffleParts = spark.sessionState.conf.numShufflePartitions
    val rows = df.select(col("grp").cast("string").as("g"), col("v"))
      .limit(SketchSampleRows).collect()
    val nGroups = rows.iterator.map(r => String.valueOf(r.getString(0)))
      .toSet.size.toLong
    val sane = est <= EstSanityCap
    val b =
      if (sane) autoBuckets(est, nGroups, shuffleParts)
      else math.min(MaxAutoBuckets,
        ((2L * shuffleParts + nGroups - 1) / nGroups).toInt)
    val vs = rows.map(_.getDouble(1)).sorted
    val bounds =
      if (b <= 1 || vs.isEmpty) Array.empty[Double]
      else (1 until b).map { i =>
        vs(math.min(vs.length - 1, (i.toLong * vs.length / b).toInt))
      }.toArray.distinct.sorted
    (bounds, if (sane) autoSortParts(est, spark) else 0)
  }

  private[graft] def fromCountsWithBounds(comp: DataFrame, ps: Seq[Double],
                                   bounds: Array[Double],
                                   sortParts: Int = 0): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "percentiles must be in [0, 1]")
    val bucketed = comp.withColumn("__bkt", bucketOf(bounds))
    // sortParts > 0: pre-partition the rank-sort input explicitly (the
    // window's required clustering on (grp, __bkt) is then already
    // satisfied, so this REPLACES the window's implicit exchange
    // rather than adding one); 0 keeps the session default
    val ranked =
      if (sortParts > 0) bucketed.repartition(sortParts, col("grp"), col("__bkt"))
      else bucketed
    // per-(grp,bucket) totals: groups×buckets rows — each bucket's
    // starting offset and the group total come from a self-join prefix
    // sum over this frame (not a window: for a GLOBAL percentile the
    // group key is a constant, folds out of a window's partition spec,
    // and would read as the single-partition-window shape the
    // fleet-wide plan audit forbids). NO broadcast hint: the frame is
    // tiny for low-cardinality groups (AQE broadcasts it from RUNTIME
    // size) but it is groups-sized — at 10⁷ l_partkey-style groups a
    // forced broadcast is a driver OOM, while the fallback shuffle
    // join is keyed by grp and stays bounded per group (≤ buckets+1
    // rows a side). q233 is the oracle that pins this shape.
    val totals = bucketed.groupBy("grp", "__bkt").agg(sum("c").as("__t"))
    val peers = totals
      .select(col("grp"), col("__bkt").as("__pb"), col("__t").as("__pt"))
    val offsets = totals.join(peers, "grp")
      .groupBy("grp", "__bkt")
      .agg(sum(when(col("__pb") < col("__bkt"), col("__pt")).otherwise(0L))
        .as("__off"),
        sum("__pt").as("__n"))
    val wRun = Window.partitionBy("grp", "__bkt").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = ranked.join(offsets, Seq("grp", "__bkt"))
      .withColumn("__e", sum("c").over(wRun) + col("__off"))
      .withColumn("__s", col("__e") - col("c") + 1)
    // Spark's Percentile: pos = p·(n−1) 0-based; ranks lo+1 / hi+1 in
    // the 1-based [s, e] intervals; interpolation in its exact double
    // operation order (ceil/floor return LONG, promoted per-term) —
    // the [[RankExprs]] shared with the fold path.
    // The requested percentiles are plan-time LITERALS, so each gets
    // its own pair of conditional-min aggregate columns — one pass,
    // no percentile×values row blowup, no extra join or exchange.
    import Rank.{lo, hi}
    val candidate = ps
      .map(p => col("__e") >= lo(p) + 1 && col("__s") <= hi(p) + 1)
      .reduce(_ || _)
    val aggCols = ps.zipWithIndex.flatMap { case (p, i) => Seq(
      min(when(col("__s") <= lo(p) + 1 && lo(p) + 1 <= col("__e"), col("v")))
        .as(s"__vlo_$i"),
      min(when(col("__s") <= hi(p) + 1 && hi(p) + 1 <= col("__e"), col("v")))
        .as(s"__vhi_$i"))
    }
    val picked = run.filter(candidate)
      .groupBy("grp")
      .agg(min("__n").as("__n"), aggCols: _*)
    val pqCols = ps.zipWithIndex.map { case (p, i) =>
      struct(lit(p).as("p"),
        Rank.interp(p, col(s"__vlo_$i"), col(s"__vhi_$i")).as("q"))
    }
    picked.select(col("grp"), explode(array(pqCols: _*)).as("__pq"))
      .select(col("grp"), col("__pq.p").as("p"), col("__pq.q").as("q"))
  }

  /** [[percentilesFromCounts]] over raw rows: sketch the range splits
    * on the RAW frame (one scan, no shuffle), then compress `value`
    * within `group` (map-side combinable; nulls dropped — `percentile`
    * semantics). The compressed groupBy appears in three branches of
    * the rank plan (offsets, runs, group sizes) but ReuseExchange
    * collapses them to ONE shuffle, so no eager checkpoint is needed —
    * the whole construction is one job plus the sketch. */
  def groupedPercentilesExact(df: DataFrame, group: Column, value: Column,
                              ps: Seq[Double], buckets: Int = 0,
                              maxFoldBytes: BigInt = SmallPlanBytes): DataFrame = {
    val base = df.select(group.as("grp"), value.cast("double").as("v"))
      .filter(col("v").isNotNull)
    val comp = base.groupBy("grp", "v").agg(count(lit(1)).as("c"))
    // adaptive cut-over on the RAW frame's optimizer estimate (which
    // upper-bounds the compressed frame): small inputs skip the sketch
    // action and the bucket-offset machinery entirely; maxFoldBytes = 0
    // forces the bucketed scale plan (see percentilesFromCounts)
    val est = planBytes(base)
    if (est <= maxFoldBytes) foldPercentilesFromCounts(comp, ps)
    else if (buckets > 0)
      fromCountsWithBounds(comp, ps, sketchBounds(base, buckets),
        sortPartsFor(est, df.sparkSession))
    else {
      // the sizing sample reads the RAW frame — a narrow scan
      // projection, not the compressed aggregate's lineage
      val (bounds, parts) = autoSketch(base, est)
      fromCountsWithBounds(comp, ps, bounds, parts)
    }
  }

  /** Equi-depth (equal-frequency) histogram — the optimizer-stats
    * histogram, built WITHOUT a global `ntile` window: the corpus
    * collapses to one row per distinct value, the distributed prefix
    * sum assigns each value its rank interval [s, e], and a broadcast
    * `buckets`-row frame intersects those intervals with the standard
    * ntile boundaries (first N mod b buckets take one extra row).
    * Per-bucket (n_rows, min, max) only depend on the sorted value
    * multiset, so tied rows straddling a boundary cannot change the
    * output — the result is exactly `ntile(buckets) ORDER BY value`.
    * Everything after the first groupBy is value-cardinality-sized. */
  def equiDepthHistogram(df: DataFrame, value: org.apache.spark.sql.Column,
                         buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val v = df.groupBy(value.as("value")).agg(count(lit(1)).as("c"))
    val run = graft.operators.Operators
      .withRunningTotal(v, col("c"), Seq(col("value")))
      .withColumn("__e", col("__run"))
      .withColumn("__s", col("__e") - col("c") + 1)
    val n = v.agg(sum("c").as("__n"))
    val bIdx = df.sparkSession.range(buckets).select(col("id").as("bucket"))
    run.crossJoin(broadcast(n)).crossJoin(broadcast(bIdx))
      .withColumn("__q", floor(col("__n") / buckets).cast("long"))
      .withColumn("__rem", col("__n") % buckets)
      .withColumn("__lo",
        col("bucket") * col("__q") + least(col("bucket"), col("__rem")))
      .withColumn("__hi", col("__lo") + col("__q") +
        when(col("bucket") < col("__rem"), 1L).otherwise(0L))
      .filter(col("__s") <= col("__hi") && col("__e") > col("__lo"))
      .withColumn("__rows",
        least(col("__e"), col("__hi")) - greatest(col("__s"), col("__lo") + 1) + 1)
      .groupBy("bucket")
      .agg(sum("__rows").as("n_rows"),
        min("value").cast("double").as("min_val"),
        max("value").cast("double").as("max_val"))
      .orderBy("bucket")
  }
}

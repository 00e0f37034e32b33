package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Spark's
  * `df.sample` draws from RNG state seeded per partition — results move
  * when partitioning moves. These operators hash the ROW KEY instead:
  * membership is a pure function of the data (stable across reruns,
  * cluster layouts, and engine versions), which is what makes holdout
  * sets and ablation samples reproducible at 100 TB.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Default membership bucket: seeded xxhash64 of the key (fast path). */
  def keyBucket(keyCols: Seq[String], seed: Long): Column =
    pmod(xxhash64(keyCols.map(col) :+ lit(seed): _*), lit(Buckets))

  /** md5-derived bucket — same semantics, reproducible in ANSI SQL
    * (the oracle-checked variant; see the dedup hashers). */
  def md5KeyBucket(keyCols: Seq[String], seed: Long): Column =
    pmod(graft.dedup.Dedup.md5Hash32(
      concat_ws("|", keyCols.map(col) :+ lit(seed.toString): _*)), lit(Buckets))

  /** Keep ~`fraction` of rows, chosen by seeded key hash. */
  def deterministicSample(df: DataFrame, keyCols: Seq[String], fraction: Double,
                          seed: Long = 42L,
                          bucketOf: (Seq[String], Long) => Column = keyBucket): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    df.filter(bucketOf(keyCols, seed) < (fraction * Buckets).toLong)
  }

  /** Stratified deterministic sample: per-stratum keep-fractions (e.g.
    * downsample boilerplate languages, keep all rare ones). Strata
    * missing from the map keep `defaultFraction`. */
  def stratifiedSample(df: DataFrame, keyCols: Seq[String], strataCol: Column,
                       fractions: Map[String, Double], defaultFraction: Double = 1.0,
                       seed: Long = 42L,
                       bucketOf: (Seq[String], Long) => Column = keyBucket): DataFrame = {
    val bucket = bucketOf(keyCols, seed)
    val threshold = fractions.foldLeft(lit((defaultFraction * Buckets).toLong)) {
      case (acc, (stratum, frac)) =>
        when(strataCol === stratum, lit((frac * Buckets).toLong)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Weighted systematic sampling without RNG: walk the cumulative
    * weight axis and keep every row whose weight interval straddles a
    * multiple of `step` — selection probability ∝ weight, expected
    * sample size = totalWeight/step, fully deterministic (the particle-
    * filter / PPS-systematic scheme). Uses the distributed prefix sum,
    * so no single-partition window; weights must be non-negative and
    * the cumulative total must stay under 2^53 (double-exact floor).
    */
  def weightedSystematicSample(df: DataFrame, weightCol: Column,
                               orderCols: Seq[Column], step: Double): DataFrame = {
    require(step > 0)
    Operators.withRunningTotal(df, weightCol, orderCols)
      .filter(floor(col("__run").cast("double") / step) >
        floor((col("__run") - col("__val")).cast("double") / step))
      .drop("__val", "__run")
  }

  /** Temperature-flattened mixture allocation (the multilingual /
    * multi-domain pretraining-mix recipe: sample domains ∝ countᵗ,
    * t < 1, so rare domains are up-weighted relative to their raw
    * share). Fixed at t = 0.5: `sqrt` is correctly-rounded IEEE-754
    * in every engine, and the normalizer sums integer micro-unit
    * weights, so the whole allocation replays bit-for-bit (a general-t
    * `pow` is libm-dependent and would not). Returns per-domain
    * (domain, n_docs, w_micro, share, alloc_docs) with Σ alloc_docs ≤
    * `budget` (floor division; remainder stays unallocated).
    *
    * 100 TB shape: one map-side-combined count by domain; everything
    * after runs on the O(|domains|) aggregate. The normalizer is a
    * 1-row aggregate broadcast-cross-joined back — lazy, no extra
    * pass, no driver collect. */
  def sqrtTemperatureMixture(df: DataFrame, domain: Column,
                             budget: Long): DataFrame = {
    val counts = df.groupBy(domain.as("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_micro",
        round(sqrt(col("n_docs").cast("double")) * 1e6).cast("long"))
    val tot = counts.agg(sum("w_micro").as("__tot_w"))
    counts.crossJoin(broadcast(tot))
      .select(col("domain"), col("n_docs"), col("w_micro"),
        round(col("w_micro").cast("double") / col("__tot_w"), 6).as("share"),
        expr(s"($budget * w_micro) div __tot_w").as("alloc_docs"))
  }

  /** Holdout-integrity audit: candidate near-duplicate pairs that
    * STRADDLE a train/test split — a near-dup of a held-out doc inside
    * the training set leaks the benchmark, which is exactly what the
    * split was supposed to prevent. `pairs` is candidates-only (the
    * bounded output of an LSH banding pass), so both joins here put a
    * tiny side against the corpus-sized assignment on a plain id
    * equi-join; nothing pair-shaped ever touches corpus volume.
    * Output: (id_a, id_b, test_a, test_b) with differing flags, flags
    * as 0/1 longs. */
  def crossSplitPairs(pairs: DataFrame, assign: DataFrame,
                      idCol: String = "doc_id",
                      flagCol: String = "is_test"): DataFrame = {
    def side(suffix: String) = assign.select(
      col(idCol).as(s"id_$suffix"),
      col(flagCol).cast("long").as(s"test_$suffix"))
    pairs.join(side("a"), "id_a").join(side("b"), "id_b")
      .filter(col("test_a") =!= col("test_b"))
      .select("id_a", "id_b", "test_a", "test_b")
  }

  /** Water-filling token-budget allocation: spread a total budget T
    * across sources by capping every source at a common water level λ —
    * `alloc = min(supply, λ)` with λ chosen so Σalloc fills T — the
    * mixture allocator that caps dominant sources while funding small
    * ones in full (the hard-cap complement of the √-temperature
    * mixture). λ is found in closed form from the supply-ascending
    * prefix sums: the first rank i where P_{i−1} + s_i·(n−i+1) ≥ T
    * gives λ = (T − P_{i−1}) div (n−i+1); integer arithmetic end to
    * end, so the allocation replays exactly (Σalloc ≤ T with slack
    * < n). If T ≥ Σsupply nothing is capped.
    *
    * 100 TB shape: supplies come from one map-side-combined aggregate;
    * everything after runs on the sources-sized frame through the
    * range-bucketed distributed running total (no single-partition
    * window), and λ broadcasts back as a 1-row frame.
    * Output: (domain, supply, alloc, capped) ordered by domain. */
  def waterfillAllocation(df: DataFrame, groupCol: Column, supplyCol: Column,
                          budget: Long): DataFrame = {
    require(budget >= 0)
    waterfillCore(df, groupCol, supplyCol, lit(budget))
  }

  /** Water-fill at a FRACTION of total supply (numer/denom, integer
    * div): the budget derives lazily from the same totals aggregate —
    * no eager driver-side count of the corpus. */
  def waterfillByFraction(df: DataFrame, groupCol: Column, supplyCol: Column,
                          numer: Long, denom: Long): DataFrame = {
    require(numer >= 0 && denom > 0)
    waterfillCore(df, groupCol, supplyCol,
      expr(s"tot_supply * ${numer}L div ${denom}L"))
  }

  /** `budgetExpr` may reference `tot_supply` (and `n_g`) from the 1-row
    * totals frame. */
  private def waterfillCore(df: DataFrame, groupCol: Column,
                            supplyCol: Column, budgetExpr: Column): DataFrame = {
    val sup = df.groupBy(groupCol.as("domain"))
      .agg(sum(supplyCol).as("supply"))
    val ord = Seq(col("supply"), col("domain"))
    val withP = graft.operators.Operators
      .withRunningTotal(sup, col("supply"), ord)
      .withColumnRenamed("__run", "p")
    val withI = graft.operators.Operators
      .withRunningTotal(withP, lit(1L), ord)
      .withColumnRenamed("__run", "i")
    val tot = withI.agg(count(lit(1)).as("n_g"), sum("supply").as("tot_supply"))
      .withColumn("t", budgetExpr)
    val j = withI.crossJoin(broadcast(tot))
    val feas = (col("p") - col("supply")) +
      col("supply") * (col("n_g") - col("i") + 1)
    val lam = j.filter(col("tot_supply") > col("t") && feas >= col("t"))
      .select(expr("(t - (p - supply)) div (n_g - i + 1)").as("water_level"),
        col("i"))
      .agg(min_by(col("water_level"), col("i")).as("water_level"))
    sup.crossJoin(broadcast(lam))
      .select(col("domain"), col("supply"),
        when(col("water_level").isNull, col("supply"))
          .otherwise(least(col("supply"), col("water_level"))).as("alloc"),
        when(col("water_level").isNull, lit(false))
          .otherwise(col("supply") > col("water_level")).as("capped"))
      .orderBy("domain")
  }

  /** Leakage-free train/holdout assignment: every document inherits
    * the split of its duplicate COMPONENT, so no near-duplicate pair
    * can straddle the boundary by construction — the constructive
    * counterpart of [[crossSplitPairs]] (which only audits an
    * existing assignment). Singleton documents (no near-dup edge) are
    * their own component. Membership is the md5 bucket of the
    * component label — a pure function of the data, stable across
    * reruns and cluster layouts like every sampler here.
    *
    * 100 TB shape: component labels come from the banding-bounded
    * candidate graph (the q92/q81 chain — no all-pairs work); the
    * assignment itself is one left equi-join of the doc ids against
    * the component table (dup-count-sized, far smaller than the
    * corpus) plus a per-row hash. The cluster_size window partitions
    * per component, bounded by the banding occupancy caps.
    * Output: (doc_id, component, cluster_size, split). */
  def componentSplit(docs: DataFrame, idCol: String, edges: DataFrame,
                     holdoutFraction: Double, seed: Long = 42L,
                     iters: Int = 8): DataFrame = {
    require(holdoutFraction > 0 && holdoutFraction < 1)
    val comp = graft.dedup.Dedup.connectedComponents(edges, iters)
    val labeled = docs.select(col(idCol))
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
    val bucket = md5KeyBucket(Seq("component"), seed)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
    labeled
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("split",
        when(bucket < lit((holdoutFraction * Buckets).toLong), lit("holdout"))
          .otherwise(lit("train")))
  }

  /** Deterministic fixed-k per-group sample: the k rows with the
    * smallest seeded key-hash buckets in each group — the reproducible
    * "k examples per domain" draw (eval-set construction, per-source
    * spot checks). Complements [[stratifiedSample]], which keeps a
    * FRACTION per stratum; this keeps an exact COUNT. Runs as the
    * bounded-heap top-k aggregate with map-side partials, so each task
    * ships at most k entries per group into the shuffle — no
    * corpus-wide window sort. Output: (grp, rn, idCol, bucket) with rn
    * 1-based in bucket order (ties: smaller id first). */
  def groupSample(df: DataFrame, idCol: String, groupCol: Column, k: Int,
                  seed: Long = 42L,
                  bucketOf: (Seq[String], Long) => Column = keyBucket): DataFrame = {
    val bucket = bucketOf(Seq(idCol), seed)
    df.groupBy(groupCol.as("grp"))
      .agg(graft.expressions.TopKAgg.top_k_ids(
        -bucket.cast("double"), col(idCol).cast("long"), k).as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("grp"), (col("i") + 1).cast("long").as("rn"),
        col("e.id").as(idCol), (-col("e.score")).cast("long").as("bucket"))
  }

  /** Split into n disjoint, exhaustive folds by key hash (cross-
    * validation / sharded holdouts). Adds a `fold` column in [0, n). */
  def withFolds(df: DataFrame, keyCols: Seq[String], n: Int,
                seed: Long = 42L): DataFrame =
    df.withColumn("fold",
      pmod(xxhash64(keyCols.map(col) :+ lit(seed): _*), lit(n.toLong)).cast("int"))

  /** Deterministic global corpus shuffle + round-robin sharding — the
    * "write the training order" step after curation: every row gets
    * its position `pos` (1-based) in a seeded md5 permutation and a
    * shard in [0, numShards). Round-robin over the permuted order
    * makes every shard an iid sample balanced to ±1 row (greedy
    * byte-balancing would correlate shard with document length), and
    * the permutation is a pure function of (keys, seed) — re-runs and
    * engines agree, which is what makes a training order auditable.
    *
    * 100 TB shape: the permutation key is a 52-bit md5 prefix (exact
    * in a double, so range bucketing stays correct); the global
    * position comes from the distributed range-bucket prefix sum —
    * NO single-partition window at any count. One wide sort-shuffle,
    * same cost class as the final write's own ordering. */
  def shuffleShards(df: DataFrame, keyCols: Seq[String], numShards: Int,
                    seed: Long = 42L): DataFrame = {
    val hkey = conv(substring(md5(concat_ws("|",
        keyCols.map(col) :+ lit(seed.toString): _*)), 1, 13), 16, 10)
      .cast("long")
    val keyed = df.withColumn("__hkey", hkey)
    Operators.withRunningTotal(keyed, lit(1L),
        Seq(col("__hkey")) ++ keyCols.map(col))
      .withColumn("pos", col("__run"))
      .withColumn("shard", pmod(col("pos") - 1, lit(numShards.toLong)))
      .drop("__run", "__val", "__hkey")
  }
}

package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k (exact; O(Q·N·d) — fine when the
  * query set is small and the corpus side is scanned once). Scale path:
  * signed-random-projection LSH — each vector gets b banded bucket keys,
  * candidates come from an equi-join on the bucket key, and only
  * candidates pay the exact-cosine cost. At 100 TB the bucket join
  * shuffles O(N·bands) small keys, never O(N²) pairs.
  *
  * All math is plain column algebra (`zip_with` + `aggregate`, double
  * accumulation) — codegen'd, no UDFs. Hyperplanes are deterministic
  * ±1 vectors derived from splitmix64, not RNG state.
  */
object Similarity {

  /** Dot product — native codegen'd expression (one fused loop; see
    * [[graft.expressions.DotProduct]]). Accumulates in double,
    * left-to-right: bit-identical to the HOF form below. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.vector_dot(a, b)

  /** Cosine — single-pass native expression (dot + both norms in one
    * loop instead of three array walks). */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.cosine_sim(a, b)

  def l2Norm(a: Column): Column =
    sqrt(graft.expressions.VectorExpressions.vector_dot(a, a))

  /** Usable-embedding predicate shared by every vector operator: the
    * array is non-null and every component is non-null, finite, AND
    * within micronization range (|x| < 9·10¹² = [[Sq.micronize]]'s
    * exact-BIGINT domain). Train/encode/search entry points FILTER on
    * this, so a crawl row with a missing, NaN/Inf, or absurdly-huge
    * embedding is excluded from vector math instead of poisoning it —
    * NaN compares false with everything (silently distorting argmins
    * and top-k order), and a component micronize can't represent would
    * otherwise become a null distance that sorts NULLS FIRST into
    * rank-1 of an ascending shortlist window. The single `abs < 9e12`
    * bound covers all three (NaN and +Inf both fail `<` under
    * Spark's and DuckDB's NaN-sorts-high semantics). The predicate is
    * a scan-fused columnar expression; census ops (e.g.
    * [[embeddingHealth]], q213) intentionally see the raw rows so the
    * exclusions stay observable. */
  def finiteVec(c: Column): Column =
    c.isNotNull && !exists(c, x =>
      x.isNull || !(abs(x.cast("double")) < lit(9.0e12)))

  /** The acceptance census behind [[finiteVec]]: per group, how many
    * vectors each exclusion reason hits (null array, null component,
    * NaN, ±Inf — a vector can count toward several) and how many are
    * usable. Run it alongside any vector pipeline so the entry
    * filters' silent exclusions become an observable number — the
    * difference `n_vecs - n_usable` is exactly the rows every
    * train/encode/search operator will skip. One narrow projection +
    * one map-side-combined aggregate; nothing vector-sized shuffles. */
  def vectorValidityCensus(df: DataFrame, group: Column, vec: Column): DataFrame = {
    def cnt(flag: Column) = sum(flag.cast("long")).cast("long")
    val nullComp = coalesce(exists(vec, x => x.isNull), lit(false))
    val hasNan = coalesce(exists(vec, x => isnan(x.cast("double"))), lit(false))
    val hasInf = coalesce(exists(vec,
      x => abs(x.cast("double")) === lit(Double.PositiveInfinity)), lit(false))
    // finite but outside micronization range — the reason column for
    // the |x| < 9e12 bound finiteVec enforces
    val hasHuge = coalesce(exists(vec, x => {
      val d = abs(x.cast("double"))
      !isnan(d) && d =!= lit(Double.PositiveInfinity) && d >= lit(9.0e12)
    }), lit(false))
    df.select(group.as("grp"), vec.isNull.as("nv"), nullComp.as("nc"),
        hasNan.as("nn"), hasInf.as("ni"), hasHuge.as("nh"),
        finiteVec(vec).as("ok"))
      .groupBy("grp")
      .agg(count(lit(1)).cast("long").as("n_vecs"),
        cnt(col("nv")).as("n_null_vec"), cnt(col("nc")).as("n_null_comp"),
        cnt(col("nn")).as("n_nan"), cnt(col("ni")).as("n_inf"),
        cnt(col("nh")).as("n_huge"), cnt(col("ok")).as("n_usable"))
  }

  /** Encoder-health census per group: vector count, dimension bounds,
    * zero-vector count, and L2-norm statistics — the cheap audit that
    * catches a broken embedding job (all-zero outputs, truncated
    * dimensions, collapsed norms) before anything expensive runs on
    * the vectors. One narrow per-row projection then a map-side-
    * combined aggregate; nothing vector-sized shuffles. Norms
    * accumulate as integer micro-units so the group means are exact
    * and shuffle-order-independent (a float sum is neither). */
  def embeddingHealth(df: DataFrame, group: Column, vec: Column): DataFrame = {
    val nrm = l2Norm(vec)
    df.select(group.as("grp"), size(vec).cast("long").as("dim"),
      round(nrm * lit(1e6), 0).cast("long").as("nrm_micro"),
      round(nrm, 6).as("nrm6"))
      .groupBy("grp")
      .agg(count(lit(1)).cast("long").as("n_vecs"),
        min("dim").as("dim_min"), max("dim").as("dim_max"),
        sum(when(col("nrm_micro") === 0L, 1L).otherwise(0L)).cast("long").as("n_zero"),
        round(sum(col("nrm_micro")).cast("double") / count(lit(1)) / lit(1e6), 6)
          .as("mean_norm"),
        min("nrm6").as("min_norm"), max("nrm6").as("max_norm"))
  }

  /** Reference HOF formulations (kept for equivalence testing — the
    * native expressions must match these bitwise). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosineHof(a: Column, b: Column): Column = {
    def norm(c: Column) =
      sqrt(aggregate(c, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dotHof(a, b) / (norm(a) * norm(b))
  }

  /** Pairwise cosine similarity between per-label centroids — the
    * class-separation / label-confusion diagnostic (two labels whose
    * centroids cos ≈ 1 are indistinguishable to a linear probe).
    *
    * Exactness: components quantize to integer milli-units and only
    * SUM from there — cosine is scale-invariant, so the centroid
    * mean's division (whose floor/truncate semantics differ across
    * engines for negative sums) never happens; dot and norms are
    * exact BIGINTs, the one double expression at the end is pinned
    * (sqrt is correctly rounded). Overflow bound: dot = Σ_dim sa·sb
    * needs every per-label component sum under √(2^63/dim) ≈ 3.8·10⁸
    * milli-units at dim=64 — worst case (every |component| = 1, i.e.
    * 1000 milli each) that is ~3.8·10⁵ vectors per label; typical
    * unit-norm embeddings (components ~1/√dim) stretch it ~8×. Beyond
    * that, pre-average per-label chunks or go DECIMAL. Zero-norm
    * centroids (all components quantize to 0) make cosine undefined —
    * those pairs are DROPPED, not emitted as NaN.
    *
    * 100 TB shape: one posexplode → (label, pos) aggregate (map-side
    * combined, the only wide shuffle); everything after runs on
    * #labels·dim rows. */
  def centroidCosineMatrix(df: DataFrame, labelCol: Column,
                           vec: Column): DataFrame = {
    val comp = df.filter(finiteVec(vec)).select(labelCol.as("label"),
      posexplode(vec).as(Seq("pos", "x")))
      .select(col("label"), col("pos"),
        round(col("x").cast("double") * 1e3).cast("long").as("mv"))
    val cent = comp.groupBy("label", "pos").agg(sum("mv").as("s"))
    val a = cent.select(col("label").as("label_a"), col("pos"), col("s").as("sa"))
    val b = cent.select(col("label").as("label_b"), col("pos"), col("s").as("sb"))
    a.join(b, Seq("pos")).filter(col("label_a") < col("label_b"))
      .groupBy("label_a", "label_b")
      .agg(sum(col("sa") * col("sb")).as("dot"),
        sum(col("sa") * col("sa")).as("na"),
        sum(col("sb") * col("sb")).as("nb"))
      .filter(col("na") > 0 && col("nb") > 0)
      .select(col("label_a"), col("label_b"),
        round(col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6)
          .as("cosine"))
  }

  /** Exact brute-force top-k: for each query vector, the k nearest
    * corpus vectors by cosine. Rank on ROUNDED similarity (6 dp) with an
    * id tie-break — fully deterministic across engines and runs.
    * The (small) query side is broadcast; the corpus streams through
    * once with no shuffle before the per-query top-k window. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.filter(finiteVec(col(vecCol)))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.filter(finiteVec(col(vecCol)))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Exact brute-force 1-NN as a map-side-combinable packed argmax —
    * the scale path next to [[bruteForceTopK]] for k = 1 (the census
    * consumers: label agreement, mislabel probes). bruteForceTopK
    * materializes every (query, candidate) sim row into a per-query
    * rank window, so the n·|audit| intermediate sorts — and spills —
    * before top-1 drops it (q142's 377 MB at sf1). Here each candidate
    * row reduces to one BIGINT — packed = (sim_micro + 10⁶)·2⁴⁰ +
    * (2⁴⁰−1 − neighbor_id), exact under 2⁶³ — and `max(packed)` is a
    * partial-aggregating hash aggregate: every scan partition combines
    * down to ONE candidate per query before anything shuffles, so the
    * shuffle and the answer are both |queries|-sized. Maximizing
    * packed = maximizing rounded sim with ties to the LOWER neighbor
    * id — bit-identical to bruteForceTopK's rank-1 row. Ids must fit
    * [0, 2⁴⁰) (a trillion — checked, fails fast). Returns
    * (query_id, neighbor_id). */
  def bruteForce1NN(corpus: DataFrame, queries: DataFrame,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val Shift = 1L << 40
    val q = queries.filter(finiteVec(col(vecCol)))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.filter(finiteVec(col(vecCol)))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    // the packed key derives from the SAME expression bruteForceTopK
    // sorts on — round(cos, 6), then scaled to an exact integer (the
    // outer round snaps the one-ulp representation error of
    // round6 × 10⁶ back onto the integer) — so the two paths round
    // half-way cases identically BY CONSTRUCTION (r13 ADVICE: the old
    // round(cos·10⁶) binary multiply could in principle flip a
    // half-way tie the decimal setScale(6) path rounds the other way).
    // A zero-norm vector makes cosine 0/0 = NaN; no SF contains one
    // (checked r13), and instead of silently dropping such a query
    // from the answer (the old null-packed behavior, which would
    // diverge from the oracle's NaN-sorts-first rank-1 row), fail
    // LOUDLY so a future dataset breaks the job, not the audit
    // (r13 ADVICE item 2).
    val cosRaw = cosine(col("qv"), col("cv"))
    val simMicro = when(!isnan(cosRaw),
      round(round(cosRaw, 6) * lit(1e6)).cast("long"))
      .otherwise(raise_error(lit(
        "bruteForce1NN: NaN cosine (zero-norm vector) — rank undefined")))
    val guarded = when(col("neighbor_id").between(0L, Shift - 1L),
      col("neighbor_id")).otherwise(raise_error(
      lit(s"bruteForce1NN: neighbor id outside [0, 2^40) packing range")))
    val packed = (simMicro + lit(1000000L)) * lit(Shift) +
      (lit(Shift - 1L) - guarded)
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), packed.as("pk"))
      .groupBy("query_id").agg(max("pk").as("mx"))
      // decode in exact LONG arithmetic only (packed ≈ 2.2e18 exceeds
      // double's 2^53 mantissa — never divide it as double)
      .select(col("query_id"),
        (lit(Shift - 1L) - col("mx") % lit(Shift)).as("neighbor_id"))
  }

  /** Per-label z-score outlier census: each vector's squared z-score
    * summed over dimensions against ITS OWN label's per-dimension
    * mean/variance — the mislabel/corruption detector run before
    * embeddings enter training (a cheap diagonal Mahalanobis).
    *
    * Exactness discipline: coordinates micronize to BIGINT, per-(label,
    * dim) count/sum/sum-of-squares are exact integer sums, and each
    * dimension's z² term — num²/den over exact integers, one pinned
    * double divide — re-micronizes before the per-vector sum, so the
    * census is order-free and replays bit-for-bit. Integer bounds: with
    * |x| ≤ 1 the s2 sums stay under 2⁶³ to ~5·10⁵ vectors per label;
    * widen to DECIMAL(38,0) beyond. Constant dimensions (den = 0)
    * contribute 0 by definition.
    *
    * 100 TB shape: one posexplode into a map-side-combined (label, dim)
    * aggregate (labels × dim rows — model-sized), broadcast back into
    * the scan, one per-vector aggregate. Nothing corpus-sized shuffles
    * except the final (vec_id, label) combine. */
  def labelZscoreOutliers(df: DataFrame, topK: Int, idCol: String = "vec_id",
                          vecCol: String = "embedding",
                          labelCol: String = "label"): DataFrame = {
    val xm = df.filter(finiteVec(col(vecCol)))
      .select(col(idCol).as("vec_id"), col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col("vec_id"), col("label"), col("pos"),
        round(col("x").cast("double") * lit(1e6)).cast("long").as("xm"))
    val st = xm.groupBy("label", "pos")
      .agg(count(lit(1)).as("n"), sum("xm").as("s1"),
        sum(col("xm") * col("xm")).as("s2"))
    val num = (col("xm") * col("n") - col("s1")).cast("double")
    val den = col("n") * col("s2") - col("s1") * col("s1")
    val term = when(den > 0,
      round(num * num / den.cast("double") * lit(1e6)).cast("long"))
      .otherwise(lit(0L))
    xm.join(broadcast(st), Seq("label", "pos"))
      .select(col("vec_id"), col("label"), term.as("zterm"))
      .groupBy("vec_id", "label").agg(sum("zterm").as("z2_micro"))
      .orderBy(col("z2_micro").desc, col("vec_id"))
      .limit(topK)
  }

  /** Hard-negative mining for contrastive training: for each query,
    * the k most similar corpus vectors with a DIFFERENT label — the
    * near-misses that define the decision boundary, which random
    * negatives almost never sample. Exact brute-force over a bounded
    * (broadcast) query batch: this is the audit/eval form; the
    * production path swaps the cross join for an IVF/PQ shortlist
    * (q182's machinery) and applies the same label filter + re-rank,
    * making the per-query cost the probe's scan fraction instead of
    * the corpus. Output: (query_id, rank, neighbor_id, neighbor_label,
    * sim). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val q = queries.filter(finiteVec(col(vecCol)))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        col(labelCol).as("qlabel"))
    val c = corpus.filter(finiteVec(col(vecCol)))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col(labelCol).as("neighbor_label"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("neighbor_label") =!= col("qlabel"))
      .select(col("query_id"), col("neighbor_id"), col("neighbor_label"),
        round(cosine(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "neighbor_label", "sim")
  }

  /** Truncation-quality audit (the Matryoshka question): if the ANN
    * tier ran on the first `truncDim` coordinates instead of the full
    * vector — 4× less data moved and scanned — how much of the
    * full-precision top-k survives? Per query: overlap@k between the
    * full-dim and truncated-dim exact top-k, plus both top-1 ids. The
    * acceptance number that licenses a cheap truncated prefilter tier
    * (scan truncated codes, re-rank survivors at full precision).
    *
    * Exact bounded-batch form over a broadcast query set; both
    * similarities come from ONE pass over each (query, corpus) pair —
    * the truncated slice is a projection, not a second scan. */
  def truncationOverlap(corpus: DataFrame, queries: DataFrame, k: Int,
                        truncDim: Int, idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val q = queries.filter(finiteVec(col(vecCol)))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.filter(finiteVec(col(vecCol)))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("sim_full"),
        round(cosine(slice(col("qv"), 1, truncDim),
          slice(col("cv"), 1, truncDim)), 6).as("sim_trunc"))
    def top(simCol: String) = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col(simCol).desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }
    val tf = top("sim_full")
    val tt = top("sim_trunc")
    val overlap = tf.join(tt, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("overlap_k"))
    tf.filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id").as("top_full_id"))
      .join(tt.filter(col("rank") === 1)
        .select(col("query_id"), col("neighbor_id").as("top_trunc_id")),
        "query_id")
      .join(overlap, Seq("query_id"), "left")
      .select(col("query_id"), col("top_full_id"), col("top_trunc_id"),
        coalesce(col("overlap_k"), lit(0L)).as("overlap_k"))
  }

  /** Deterministic ±1 hyperplane matrix: planes × dim. Exposed inside
    * the package so the oracle-SQL generators can embed the SAME planes
    * as literals — the SQL replays the exact bucketing. */
  private[graft] def hyperplanes(planes: Int, dim: Int, seed: Long): Array[Array[Int]] = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.fill(planes) {
      Array.fill(dim)(if ((next() & 1L) == 0L) 1 else -1)
    }
  }

  /** Signed-random-projection signature: `planes` sign bits, banded into
    * `bands` bucket keys (array<struct<band:int, bh:bigint>>). */
  def srpBandKeys(vec: Column, dim: Int, planes: Int = 16, bands: Int = 4,
                  seed: Long = 42L): Column = {
    require(planes % bands == 0)
    val rows = planes / bands
    val hp = hyperplanes(planes, dim, seed)
    val bits: Seq[Column] = hp.toSeq.map { plane =>
      val planeCol = array(plane.map(v => lit(v.toDouble)): _*)
      when(dot(vec, planeCol) >= 0, lit(1L)).otherwise(lit(0L))
    }
    array((0 until bands).map { b =>
      val key = (0 until rows).map(r => bits(b * rows + r) * lit(1L << r))
        .reduce(_ + _)
      struct(lit(b).as("band"), key.as("bh"))
    }: _*)
  }

  /** LSH-bucketed approximate top-k: candidates share at least one SRP
    * band with the query; exact cosine ranks the candidates. Recall is
    * tuned by (planes, bands); cost is the bucket equi-join. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              planes: Int = 16, bands: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val corpusF = corpus.filter(finiteVec(col(vecCol)))
    val queriesF = queries.filter(finiteVec(col(vecCol)))
    def keyed(df: DataFrame, id: String, v: String) = df
      .select(col(idCol).as(id), col(vecCol).as(v),
        explode(srpBandKeys(col(vecCol), dim, planes, bands)).as("bk"))
      .select(col(id), col(v), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val c = keyed(corpusF, "neighbor_id", "cv")
    val q = keyed(queriesF, "query_id", "qv")
    // candidate dedup on IDS ONLY — never shuffle the float arrays —
    // then join the vectors back for the exact-cosine verify.
    val cand = c.drop("cv").join(q.drop("qv"), Seq("band", "bh"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val qv = queriesF.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val cv = corpusF.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = cand
      .join(broadcast(qv), Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, SRP-candidate
    * generation + exact verify (id_a < id_b).
    *
    * The candidate dedup runs AFTER the cosine filter, not before: a
    * pair sharing k bands is verified k times (k ≤ bands, a few extra
    * codegen'd dot products), but the distinct then aggregates only
    * ANSWER-sized (id_a, id_b, sim) rows instead of hash-mapping the
    * full exploded candidate join output — at sf1 / 2 GiB the
    * pre-verify distinct spilled 2.6 GB across three stages, twice
    * over because the final orderBy's RangePartitioner re-executes its
    * child to sample range boundaries; post-filter the distinct's
    * exchange is answer-sized AND gives the sampler a cheap shuffle
    * boundary to re-read. `sim` is a pure function of the pair, so the
    * post-filter distinct yields exactly the pre-distinct row set. */
  def embeddingNearDups(df: DataFrame, threshold: Double, dim: Int,
                        planes: Int = 24, bands: Int = 4,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dfF = df.filter(finiteVec(col(vecCol)))
    // band keys only — the self-join shuffles just (band, bh, id);
    // vectors rejoin once for the exact verify.
    val keyed = dfF
      .select(col(idCol).as("id"),
        explode(srpBandKeys(col(vecCol), dim, planes, bands)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val cand = keyed.alias("a")
      .join(keyed.alias("b"), col("a.band") === col("b.band") &&
        col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val va = dfF.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val vb = dfF.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    cand
      .join(va, Seq("id_a"))
      .join(vb, Seq("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("va"), col("vb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .distinct()
  }

  /** Embedding-space decontamination: for every corpus vector, the
    * best cosine against the BENCHMARK set (SRP band candidates +
    * exact verify — the bipartite form of [[embeddingNearDups]]), and
    * a `contaminated` verdict at `threshold`. Docs sharing no band
    * with any benchmark vector report null match — by construction
    * not near any benchmark at the banding's operating point.
    *
    * 100 TB shape: band keys shuffle ids only; the benchmark side —
    * queries, in effect — broadcasts twice (band keys + vectors); the
    * corpus never self-joins and the verify join is candidate-sized. */
  def embedDecontam(corpus: DataFrame, benchmark: DataFrame,
                    threshold: Double, dim: Int,
                    planes: Int = 24, bands: Int = 4,
                    idCol: String = "vec_id", vecCol: String = "embedding")
  : DataFrame = {
    val corpusF = corpus.filter(finiteVec(col(vecCol)))
    val benchmarkF = benchmark.filter(finiteVec(col(vecCol)))
    def keyed(df: DataFrame, id: String) = df
      .select(col(idCol).as(id),
        explode(srpBandKeys(col(vecCol), dim, planes, bands)).as("bk"))
      .select(col(id), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val cand = keyed(corpusF, "vec_id")
      .join(broadcast(keyed(benchmarkF, "bench_id")), Seq("band", "bh"))
      .select("vec_id", "bench_id").distinct()
    val cv = corpusF.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
    val bv = benchmarkF.select(col(idCol).as("bench_id"), col(vecCol).as("bv"))
    val scored = cand
      .join(cv, Seq("vec_id"))
      .join(broadcast(bv), Seq("bench_id"))
      .select(col("vec_id"), col("bench_id"),
        round(cosine(col("cv"), col("bv")), 6).as("sim"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("bench_id").asc)
    val best = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    corpusF.select(col(idCol).as("vec_id"))
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("bench_id"), col("sim"),
        coalesce(col("sim") >= threshold, lit(false)).as("contaminated"))
  }

  /** SemDeDup-style semantic dedup over a cell-assigned corpus (e.g.
    * [[Ivf.train]]'s `assigned`): a vector is dropped when ANY lower-id
    * vector in the SAME cell has cosine ≥ threshold — "near-duplicate
    * of an earlier document", the deterministic parallel form of greedy
    * pruning (EXISTS-semantics, not the sequential chain, so it is one
    * self-join, not an un-parallelizable scan).
    *
    * Scale shape: the pairwise work is an equi-join on `cell`, so cost
    * is Σ|cell|² ≈ n²/nlist, tuned by the quantizer — at 100 TB the
    * corpus is stored partitioned BY cell and the join co-locates;
    * nothing all-pairs ever shuffles. Returns (id, cell, kept). */
  def semDedup(assigned: DataFrame, threshold: Double,
               idCol: String = "vec_id", vecCol: String = "embedding",
               cellCol: String = "cell"): DataFrame = {
    val assignedF = assigned.filter(finiteVec(col(vecCol)))
    val a = assignedF.select(col(cellCol).as("cell"),
      col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = assignedF.select(col(cellCol).as("cell"),
      col(idCol).as("id_b"), col(vecCol).as("vb"))
    val drops = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(cosine(col("va"), col("vb")), 6) >= threshold)
      .select(col("id_b").as("drop_id"))
      .distinct()
    assignedF
      .join(drops, col(idCol) === col("drop_id"), "left")
      .select(col(idCol), col(cellCol), col("drop_id").isNull.as("kept"))
  }
}

package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ, Jégou et al. 2011) for approximate
  * nearest-neighbor search — the FAISS IVF-PQ code path's compression
  * stage: the `dim`-dimensional vector is split into `m` contiguous
  * subspaces of `dim/m` dims, each subspace gets its own `ksub`-entry
  * k-means codebook, and a vector becomes `m` small codes (m bytes at
  * ksub ≤ 256 vs 4·dim float bytes — 32× at the defaults here). A
  * query scans the codes with the asymmetric distance computation
  * (ADC): one `m × ksub` lookup table of exact query-to-centroid
  * subdistances per query, then each candidate costs just `m` table
  * lookups — THE property that makes billion-vector scans affordable.
  *
  * Where [[Sq]] quantizes each dimension independently (per-dim
  * uniform bins), PQ quantizes each subspace JOINTLY (k-means over
  * 8-dim subvectors here), capturing cross-dimension correlation at
  * the same code budget.
  *
  * Everything runs in integer micro-units (`round(x·10⁶)` as BIGINT,
  * the [[Ivf.trainChecked]] trick): seeds are md5-ordered rows,
  * per-subspace Lloyd assignment is an exact BIGINT argmin (ties to
  * the lower code), centroid updates are truncating-division integer
  * means (Java long `/` ≡ DuckDB integer `//`), and both the ADC and
  * the exact re-rank are BIGINT sums of squares — the whole pipeline
  * is bit-replayable by an ANSI oracle, no float drift anywhere.
  *
  * 100 TB shape: the codebook is a driver-side model (m·ksub·dim/m =
  * dim·ksub longs — KBs) broadcast as ONE literal; encoding is a
  * per-row projection fused into the scan and the code table is the
  * only thing the scan reads (the full-precision vectors stay in the
  * store); the ADC pass is corpus-linear with the query batch (codes ×
  * broadcast LUTs, no shuffle of the corpus); only shortlist ids
  * shuffle for the per-query top-k window, and the exact re-rank
  * re-fetches |queries|·rerank vectors via a broadcast join back onto
  * the store. Train cost is iters · corpus-linear with a 1 KB-ish
  * aggregate state (m·ksub·subdim sums) — the classic "train on a
  * sample, encode everything" also applies verbatim.
  */
object Pq {

  /** subDist in integer micro-units: ‖mv[s·sd+1 .. s·sd+sd] − cv‖²
    * as one left-to-right BIGINT fold (exact, order-fixed). */
  private def subDist(mv: Column, s: Column, cv: Column, sd: Int): Column =
    aggregate(sequence(lit(0), lit(sd - 1)), lit(0L), (acc, j) => {
      val x = element_at(mv, s * lit(sd) + j + lit(1)) -
        element_at(cv, j + lit(1))
      acc + x * x
    })

  /** The codebook as ONE 3-D literal `cl[sub][code][j]` — O(1)
    * expression-tree size in m·ksub (same reasoning as
    * [[Ivf]]'s centroid literal). */
  private def centLit(cents: Array[Array[Array[Long]]]): Column =
    typedLit(cents.map(_.map(_.toSeq).toSeq).toSeq)

  /** Code-assignment column: array of `m` codes, each the argmin of
    * the exact integer subdistance over its subspace's codebook, ties
    * to the lower code (argmin key `d·ksub + code` — exact:
    * d ≤ m·sd·(2·10⁶)² ≈ 2⁴⁵ keeps the key far under 2⁶³, and the
    * `+ code` term IS the lower-code tie-break). Native codegen'd
    * expression ([[graft.expressions.PqCodes]]) — the HOF triple nest
    * it replaces paid ~10⁴ interpreted lambda evals per row AND
    * dragged its whole projection out of whole-stage codegen. */
  def codesExpr(mv: Column, cents: Array[Array[Array[Long]]]): Column =
    graft.expressions.PqExpressions.pq_codes(mv, cents)

  /** Per-query ADC lookup table: `lut[sub][code]` = exact integer
    * subdistance from the query's subvector to that codebook entry —
    * computed ONCE per query (m·ksub folds), then every candidate
    * costs m lookups. */
  def lutExpr(qmv: Column, cents: Array[Array[Array[Long]]]): Column = {
    val m = cents.length
    val ksub = cents(0).length
    val sd = cents(0)(0).length
    val cl = centLit(cents)
    transform(sequence(lit(0), lit(m - 1)), s =>
      transform(sequence(lit(0), lit(ksub - 1)), c =>
        subDist(qmv, s, element_at(element_at(cl, s + lit(1)), c + lit(1)), sd)))
  }

  /** Cross-engine-checkable trainer: md5-ordered seed rows (the first
    * `ksub` corpus vectors by `(md5(id), id)` seed ALL `m` subspace
    * codebooks — subspace s takes the seed's s-th subvector), then
    * `iters` Lloyd rounds where assignment is the exact BIGINT argmin
    * and the centroid update is the truncating-division integer mean per
    * (sub, code, j). Codes with no members keep their previous
    * centroid. Returns `cents(sub)(code)(j)` in micro-units. */
  def trainChecked(corpus: DataFrame, m: Int, ksub: Int, iters: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding")
  : Array[Array[Array[Long]]] =
    trainCheckedMicro(
      corpus.filter(Similarity.finiteVec(col(vecCol)))
        .select(col(idCol).as("id"), Sq.micronize(col(vecCol)).as("mv")),
      m, ksub, iters)

  /** [[trainChecked]] over an ALREADY-micronized vector table
    * (id, mv: array<bigint>) — the entry point residual encoding
    * ([[IvfPq.residualAdcTopK]]) uses, where the micro vectors are
    * exact integer residuals rather than `round(x·10⁶)` of a float
    * column. Identical seeding, update rule, and truncating division. */
  def trainCheckedMicro(mvDf: DataFrame, m: Int, ksub: Int, iters: Int)
  : Array[Array[Array[Long]]] = {
    val mv = mvDf.select(col("id"), col("mv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val seeds = mv
        .orderBy(graft.dedup.Dedup.md5Hash32(col("id").cast("string")).asc,
          col("id").asc)
        .limit(ksub).collect().map(_.getSeq[Long](1).toArray)
      require(seeds.length == ksub,
        s"corpus has ${seeds.length} rows < ksub=$ksub")
      val dim = seeds(0).length
      require(dim % m == 0, s"dim=$dim not divisible by m=$m")
      val sd = dim / m

      var cents: Array[Array[Array[Long]]] = Array.tabulate(m)(s =>
        Array.tabulate(ksub)(c => seeds(c).slice(s * sd, (s + 1) * sd)))

      for (_ <- 1 to iters) {
        // one distributed pass: explode positions, key by
        // (sub = pos div sd, code = codes[sub], j = pos mod sd).
        // The codes projection MUST materialize before the explode —
        // left lazy, the optimizer collapses it into the post-Generate
        // projection and re-evaluates the m·ksub·sd argmin once per
        // exploded row (64×/row: measured 8.2 s vs 0.7 s per round at
        // ksub=256, n=2000). localCheckpoint is the barrier; training
        // at scale runs on a sample, so the materialization stays
        // sample-sized (the q195 AS-MATERIALIZED discipline).
        val coded = mv
          .select(col("mv"), codesExpr(col("mv"), cents).as("codes"))
          .localCheckpoint(true)
        val sums = coded
          .select(col("codes"), posexplode(col("mv")).as(Seq("pos", "x")))
          .select(
            expr(s"CAST(pos div $sd AS INT)").as("sub"),
            expr(s"element_at(codes, CAST(pos div $sd AS INT) + 1)").as("code"),
            expr(s"CAST(pos % $sd AS INT)").as("j"),
            col("x"))
          .groupBy("sub", "code", "j")
          .agg(sum("x").as("sm"), count(lit(1)).as("n"))
          .collect()
        val next = cents.map(_.map(_.clone()))
        sums.foreach { r =>
          // Java long `/` truncates toward zero ≡ DuckDB's integer `//`
          // (measured: SELECT -7 // 2 → -3, NOT floor's -4) — integer
          // sums over negative coordinates hit this on most centroids
          next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
            r.getLong(3) / r.getLong(4)
        }
        cents = next
      }
      cents
    } finally { mv.unpersist(blocking = false); () }
  }

  /** Encode the corpus: (idCol, codes[m]) — the compressed index. The
    * projection is the ONLY thing a PQ scan materializes. */
  def encode(corpus: DataFrame, cents: Array[Array[Array[Long]]],
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.filter(Similarity.finiteVec(col(vecCol)))
      .select(col(idCol),
        codesExpr(Sq.micronize(col(vecCol)), cents).as("codes"))

  /** Two-stage ANN: ADC scan over the codes (per-query LUT, m lookups
    * per candidate) → `rerank`-deep shortlist per query → exact
    * integer-distance re-rank against the full-precision store → top
    * `k`. Output: (query_id, rank, neighbor_id, adist, edist), all
    * BIGINT. `excludeSelf` drops the corpus row whose id equals the
    * query id (querying the corpus by its own rows). */
  def adcTopK(corpus: DataFrame, cents: Array[Array[Array[Long]]],
              queries: DataFrame, k: Int, rerank: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              excludeSelf: Boolean = true): DataFrame = {
    val m = cents.length
    val encoded = encode(corpus, cents, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("codes"))
    val q = queries.filter(Similarity.finiteVec(col(vecCol)))
      .select(col(idCol).as("query_id"),
        Sq.micronize(col(vecCol)).as("qmv"))
      .withColumn("lut", lutExpr(col("qmv"), cents))
    val scanned = encoded
      .crossJoin(broadcast(q.select(col("query_id"), col("lut"))))
    val approx = (if (excludeSelf)
      scanned.filter(col("query_id") =!= col("neighbor_id"))
    else scanned)
      .select(col("query_id"), col("neighbor_id"),
        graft.expressions.PqExpressions.pq_adc(col("codes"), col("lut"))
          .as("adist"))
    rerankTail(approx, corpus, q.select("query_id", "qmv"), k, rerank,
      idCol, vecCol)
  }

  /** Shortlist + exact-integer re-rank shared by the full-scan ADC
    * ([[adcTopK]]) and the IVF-routed ADC ([[IvfPq.adcTopK]]).
    * `approx` = (query_id, neighbor_id, adist); `q` = (query_id, qmv). */
  private[similarity] def rerankTail(approx: DataFrame, corpus: DataFrame,
                                     q: DataFrame, k: Int, rerank: Int,
                                     idCol: String, vecCol: String): DataFrame = {
    val wa = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    val shortlist = approx.withColumn("arank", row_number().over(wa))
      .filter(col("arank") <= rerank)
    val store = corpus.filter(Similarity.finiteVec(col(vecCol)))
      .select(col(idCol).as("neighbor_id"),
        Sq.micronize(col(vecCol)).as("mv"))
    val exact = store
      .join(broadcast(shortlist.join(q, "query_id")), Seq("neighbor_id"))
      .withColumn("edist",
        expr("aggregate(zip_with(qmv, mv, (a, b) -> (a - b) * (a - b)), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
    val we = Window.partitionBy("query_id")
      .orderBy(col("edist").asc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(we).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("adist"), col("edist"))
  }
}

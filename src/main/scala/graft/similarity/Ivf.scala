package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour index — the
  * k-means-quantizer scale path for similarity search (FAISS-style
  * IVF-Flat, on DataFrames):
  *
  *  - **train**: Lloyd's iterations where the ONLY distributed work per
  *    iteration is (a) one narrow pass assigning rows to their nearest
  *    centroid (argmin over a broadcast centroid list, computed by the
  *    native fused [[graft.expressions.DotProduct]] loops) and (b) one
  *    posexplode + groupBy(cell, dim) mean to re-estimate centroids.
  *    Centroids (nlist × dim doubles) live on the driver like any other
  *    fitted model — the corpus itself never leaves the executors.
  *  - **probe**: queries rank cells by centroid distance, visit the
  *    `nprobe` nearest inverted lists, and pay exact cosine only inside
  *    them. At 100 TB the assigned corpus is written partitioned BY
  *    cell, so a probe is a partition-pruned scan of nprobe/nlist of
  *    the data.
  *
  * Initial centroids are the `nlist` corpus vectors with the smallest
  * seeded key hash — deterministic, no RNG state (SURVEY §7.4.1
  * discipline).
  */
object Ivf {

  final case class Index(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Auto-sized cell count: ⌊4·√n⌋ clamped to [4, n/8] — fine enough
    * that probing a recall-driven number of cells scans well under
    * half the corpus (measured on the near-random unit-vector test
    * embeddings, the hardest geometry), coarse enough that the
    * centroid table stays a driver-side model (√n·dim doubles) and the
    * mean cell still holds ≥ 8 vectors. The same formula must be
    * replayed by the oracle SQL, so it sticks to floor/integer ops. */
  def autoNlist(n: Long): Int =
    math.max(4L, math.min(n / 8, math.floor(4.0 * math.sqrt(n.toDouble)).toLong)).toInt

  /** Centroid table as ONE 2-D array literal (plus its squared-norm
    * row) — the expression tree stays O(1) in nlist, where a
    * struct-per-centroid form at nlist = 4·√n would unroll thousands
    * of nodes and blow past codegen method limits. */
  private def centroidLits(centroids: Array[Array[Double]]): (Column, Column) = {
    val cs: Seq[Seq[Double]] = centroids.map(_.toSeq).toSeq
    // norms accumulate left-to-right on the driver, matching the SQL
    // twin's list_sum over x*x
    val nm: Seq[Double] = centroids.map(_.map(x => x * x).sum).toSeq
    (typedLit(cs), typedLit(nm))
  }

  /** Negated squared L2 distance of `vec` to centroid i (0-based):
    * 2·v·cᵢ − ‖cᵢ‖² (the ‖v‖² term is rank-invariant and dropped). */
  private def negDist(vec: Column, cLit: Column, nLit: Column, i: Column): Column =
    Similarity.dot(vec, element_at(cLit, i + lit(1))) * 2.0 -
      element_at(nLit, i + lit(1))

  /** Cell-assignment column: id of the nearest centroid. Ties break to
    * the lower cell id (strict-improvement scan over ascending cells).
    * Native codegen'd expression ([[graft.expressions.NearestCell]]) —
    * the assignment runs over the whole corpus once per Lloyd round,
    * and the HOF fold it replaces paid an interpreted lambda per cell
    * per row. Bit-identical accumulation (left-to-right doubles,
    * strict >), so the oracle hashes don't move. */
  private def cellExpr(vec: Column, centroids: Array[Array[Double]]): Column =
    graft.expressions.VectorExpressions.nearest_cell(vec, centroids,
      centroids.map(_.map(x => x * x).sum))

  /** Assign vectors to their nearest STORED centroid — the maintenance
    * path between retrains: a streaming ingest batch-assigns new
    * vectors against the shipped index without touching the trainer
    * ([[graft.streaming.AnnIngest]]). Same native expression, same
    * tie-break, as every training round. */
  def assign(df: DataFrame, centroids: Array[Array[Double]],
             vecCol: String = "embedding"): DataFrame =
    df.filter(Similarity.finiteVec(col(vecCol)))
      .withColumn("cell", cellExpr(col(vecCol), centroids))

  /** All cells ranked by centroid proximity to `vec`: array of
    * struct(s, cell) sorted s DESC then cell DESC — the probe order.
    * (Descending cell on ties matches the SQL twin's ORDER BY.) */
  private def rankedCells(vec: Column, centroids: Array[Array[Double]]): Column = {
    val (cLit, nLit) = centroidLits(centroids)
    reverse(array_sort(transform(
      sequence(lit(0), lit(centroids.length - 1)),
      i => struct(negDist(vec, cLit, nLit, i).as("s"), i.as("cell")))))
  }

  /** Train the coarse quantizer and assign every corpus vector to its
    * cell. `assigned` = corpus + `cell` column (lazy plan; persist or
    * write partitioned-by-cell for reuse). */
  def train(corpus: DataFrame, nlist: Int, iters: Int = 5, seed: Long = 42L,
            idCol: String = "vec_id", vecCol: String = "embedding"): Index = {
    // training makes 1 + iters passes over the vectors — cache the
    // narrow (id, vec) projection for the duration (unpersisted below;
    // the returned lazy `assigned` plan reads the source, not the cache)
    val vecs = corpus.filter(Similarity.finiteVec(col(vecCol)))
      .select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // deterministic seeded init: nlist vectors with smallest hashed id
    var centroids: Array[Array[Double]] = vecs
      .orderBy(xxhash64(col(idCol), lit(seed)).asc, col(idCol).asc)
      .limit(nlist)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)

    for (_ <- 1 to iters) {
      val assigned = vecs.select(col(vecCol).as("v"),
        cellExpr(col(vecCol), centroids).as("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(avg(col("x")).as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      centroids = centroids.indices.map { c =>
        byCell.get(c) match {
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val arr = new Array[Double](dim)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            arr
          case None => centroids(c) // empty cell keeps its centroid
        }
      }.toArray
    }

    vecs.unpersist(blocking = false)
    Index(centroids, assign(corpus, centroids, vecCol))
  }

  /** Cross-engine-checkable trainer: same Lloyd's structure as [[train]]
    * but every data-dependent number is bit-reproducible in ANSI SQL —
    *  - init order = md5-derived hash of the id (not xxhash64);
    *  - centroid means accumulate integer MICRO-UNITS
    *    (`round(x·10⁶)` as bigint): integer sums are exact and
    *    order-independent, so the float shuffle-merge wobble that keeps
    *    [[train]] un-oracle-able disappears; the mean is then the one
    *    double `sum / (10⁶·n)` in both engines.
    * Quantization costs ~1e-6 per coordinate of centroid precision —
    * irrelevant for a coarse quantizer's routing quality. */
  def trainChecked(corpus: DataFrame, nlist: Int, iters: Int = 3,
                   idCol: String = "vec_id", vecCol: String = "embedding"): Index = {
    val vecs = corpus.filter(Similarity.finiteVec(col(vecCol)))
      .select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var centroids: Array[Array[Double]] = vecs
      .orderBy(graft.dedup.Dedup.md5Hash32(col(idCol).cast("string")).asc,
        col(idCol).asc)
      .limit(nlist)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)

    for (_ <- 1 to iters) {
      val assigned = vecs.select(col(vecCol).as("v"),
        cellExpr(col(vecCol), centroids).as("cell"))
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum(round(col("x").cast("double") * 1000000.0).cast("long")).as("sm"),
          count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      centroids = centroids.indices.map { c =>
        byCell.get(c) match {
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val arr = new Array[Double](dim)
            rows.foreach(r => arr(r.getInt(1)) = r.getLong(2) / (1000000.0 * r.getLong(3)))
            arr
          case None => centroids(c)
        }
      }.toArray
    }

    vecs.unpersist(blocking = false)
    Index(centroids, assign(corpus, centroids, vecCol))
  }

  /** Candidate pairs at probe depth `nprobe`: each query joined to
    * every corpus vector in its `nprobe` nearest cells (self excluded)
    * — the rows an exact re-rank will score. Exposed separately from
    * [[topK]] so audits can count them: |candidates| / (n−1) IS the
    * probe cost. */
  def candidates(index: Index, queries: DataFrame, nprobe: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probes = queries.filter(Similarity.finiteVec(col(vecCol)))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        slice(rankedCells(col(vecCol), index.centroids), 1, nprobe).as("cs"))
      .select(col("query_id"), col("qv"), explode(col("cs")).as("c"))
      .select(col("query_id"), col("qv"), col("c.cell").as("cell"))
    index.assigned
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("cell"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
  }

  /** Approximate top-k: visit the `nprobe` cells whose centroids are
    * nearest each query, exact cosine inside them. */
  def topK(index: Index, queries: DataFrame, k: Int, nprobe: Int,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scored = candidates(index, queries, nprobe, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Probe rank of every cell for every query: (query_id, cell, pr)
    * with pr = 1 the nearest centroid. The tuning/audit view of
    * [[candidates]]' routing decision. */
  def probeRanks(index: Index, queries: DataFrame,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    queries.filter(Similarity.finiteVec(col(vecCol)))
      .select(col(idCol).as("query_id"),
        posexplode(rankedCells(col(vecCol), index.centroids)).as(Seq("pos", "c")))
      .select(col("query_id"), col("c.cell").as("cell"),
        (col("pos") + 1).as("pr"))

  /** Choose the probe depth for a target recall, empirically: take a
    * deterministic md5-selected tuning sample of queries, compute their
    * exact top-k (the audit's one bounded brute-force cost), and for
    * each (query, true neighbor) record the probe depth that would
    * cover the neighbor's cell. The chosen nprobe is the
    * ⌈target·|pairs|⌉-th smallest such depth — the minimum depth whose
    * COVERAGE recall on the sample meets the target. Coverage recall
    * equals delivered recall@k here: a covered true top-k neighbor is
    * only outranked by better true neighbors, never dropped.
    *
    * Everything is integer ranks over deterministic orders, so the
    * oracle SQL replays the tuner exactly; the collect is
    * sample·k ints — model-sized, like the centroids themselves. */
  def tuneNprobe(index: Index, k: Int = 3, targetRecall: Double = 0.95,
                 sampleSize: Int = 48,
                 idCol: String = "vec_id", vecCol: String = "embedding"): Int = {
    val sample = index.assigned
      .orderBy(graft.dedup.Dedup.md5Hash32(
        concat(col(idCol).cast("string"), lit("tune"))).asc, col(idCol).asc)
      .limit(sampleSize)
      .select(col(idCol), col(vecCol))
    val truth = Similarity.bruteForceTopK(index.assigned, sample, k, idCol, vecCol)
    val cellOf = index.assigned.select(col(idCol).as("neighbor_id"), col("cell"))
    val needs = truth.select("query_id", "neighbor_id")
      .join(cellOf, "neighbor_id")
      .join(probeRanks(index, sample, idCol, vecCol), Seq("query_id", "cell"))
      .select(col("pr"))
      .collect().map(_.getInt(0)).sorted
    require(needs.nonEmpty, "tuneNprobe: empty tuning sample")
    needs(math.max(0, math.ceil(targetRecall * needs.length).toInt - 1))
  }

  /** Ingest/staleness census: after a batch lands in the index (new
    * vectors assign to their nearest EXISTING cell — the `NearestCell`
    * expression against the stored centroid table), which cells
    * absorbed the mass? A cell whose growth far outpaces its share
    * signals distribution drift and schedules the periodic retrain;
    * uniform growth means the index is still representative.
    *
    * `isNew` marks the batch rows inside the assignment (here a
    * deterministic hash slice; production passes an ingest-time flag).
    * The demo trains on the union corpus because the oracle replays
    * that chain end-to-end — the production path assigns the batch
    * against the STORED centroids, and this census is identical.
    *
    * Output per occupied cell: (cell, n_old, n_new, growth_micro =
    * n_new/n_old, share_new_micro = n_new/Σn_new), all exact integer
    * ratios; nlist rows, model-sized. */
  def ingestCensus(index: Index, isNew: Column): DataFrame = {
    val a = index.assigned.withColumn("is_new", isNew)
    val cen = a.groupBy("cell").agg(
      sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_old"),
      sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"))
    val tot = cen.agg(sum("n_new").as("__tn"))
    cen.crossJoin(broadcast(tot))
      .select(col("cell").cast("long").as("cell"), col("n_old"), col("n_new"),
        when(col("n_old") > 0, expr("n_new * 1000000L div n_old"))
          .as("growth_micro"),
        when(col("__tn") > 0, expr("n_new * 1000000L div __tn")).otherwise(0L)
          .as("share_new_micro"))
      .orderBy("cell")
  }

  /** Index-health census: per-cell occupancy, share of the corpus, and
    * imbalance factor (n_vecs · nlist / total — 1.0 is perfectly
    * balanced). The acceptance check before an IVF index ships: a hot
    * cell (imbalance ≫ 1) makes every probe touching it scan far more
    * than corpus/nlist, and an empty cell wastes a probe budget slot.
    * Empty cells are REPORTED (n_vecs = 0), not omitted. One
    * map-side-combined groupBy over the assignment — nlist rows out. */
  def cellBalance(index: Index): DataFrame = {
    val spark = index.assigned.sparkSession
    val cells = spark.range(index.centroids.length).toDF("cell")
    val occ = index.assigned.groupBy("cell").agg(count(lit(1)).as("n_vecs"))
    val full = cells.join(occ.withColumn("cell", col("cell").cast("long")),
        Seq("cell"), "left")
      .na.fill(0L, Seq("n_vecs"))
    val tot = full.agg(sum("n_vecs").as("__t"), count(lit(1)).as("__c"))
    full.crossJoin(broadcast(tot)).select(
        col("cell"), col("n_vecs"),
        round(col("n_vecs").cast("double") / col("__t").cast("double"), 6)
          .as("share"),
        round(col("n_vecs").cast("double") * col("__c").cast("double") /
          col("__t").cast("double"), 6).as("imbalance"))
      .orderBy("cell")
  }
}

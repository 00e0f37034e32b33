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

  /** Cell-assignment column: id of the nearest centroid by squared L2
    * distance ‖v‖² − 2·v·c + ‖c‖² (the ‖v‖² term is rank-invariant and
    * dropped). Ties break to the lower cell id. */
  private def cellExpr(vec: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cCol = array(c.map(lit).toSeq: _*)
      val negDist = Similarity.dot(vec, cCol) * 2.0 - lit(c.map(x => x * x).sum)
      struct(negDist.as("s"), lit(-i).as("ord"), lit(i).as("cell"))
    }
    array_max(array(scored.toSeq: _*)).getField("cell")
  }

  /** Train the coarse quantizer and assign every corpus vector to its
    * cell. `assigned` = corpus + `cell` column (lazy plan; persist or
    * write partitioned-by-cell for reuse). */
  def train(corpus: DataFrame, nlist: Int, iters: Int = 5, seed: Long = 42L,
            idCol: String = "vec_id", vecCol: String = "embedding"): Index = {
    // training makes 1 + iters passes over the vectors — cache the
    // narrow (id, vec) projection for the duration (unpersisted below;
    // the returned lazy `assigned` plan reads the source, not the cache)
    val vecs = corpus.select(col(idCol), col(vecCol))
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
    Index(centroids,
      corpus.withColumn("cell", cellExpr(col(vecCol), centroids)))
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
    val vecs = corpus.select(col(idCol), col(vecCol))
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
    Index(centroids,
      corpus.withColumn("cell", cellExpr(col(vecCol), centroids)))
  }

  /** Approximate top-k: visit the `nprobe` cells whose centroids are
    * nearest each query, exact cosine inside them. */
  def topK(index: Index, queries: DataFrame, k: Int, nprobe: Int,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cells = index.centroids.zipWithIndex.map { case (c, i) =>
      val cCol = array(c.map(lit).toSeq: _*)
      struct((Similarity.dot(col(vecCol), cCol) * 2.0 - lit(c.map(x => x * x).sum)).as("s"),
        lit(i).as("cell"))
    }
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        slice(reverse(array_sort(array(cells.toSeq: _*))), 1, nprobe).as("cs"))
      .select(col("query_id"), col("qv"), explode(col("cs")).as("c"))
      .select(col("query_id"), col("qv"), col("c.cell").as("cell"))
    val corpusCells = index.assigned
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("cell"))
    val scored = corpusCells.join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
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

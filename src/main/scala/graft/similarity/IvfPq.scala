package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-PQ: the production FAISS index shape — a coarse IVF quantizer
  * routes each query to its `nprobe` nearest cells, and ONLY those
  * cells' PQ codes pay the ADC scan; an exact integer re-rank of the
  * shortlist closes the accuracy gap. Composes the two checked
  * trainers ([[Ivf.trainChecked]], [[Pq.trainChecked]]) unchanged.
  *
  * [[adcTopK]] codes RAW vectors (the FAISS flat-code variant);
  * [[residualAdcTopK]] codes residuals v − c(v) — the FAISS default —
  * keeping integer-micro exactness by flooring the cell centroid
  * itself to micro units ([[centroidsMicro]]).
  *
  * 100 TB shape: the corpus scan reads (cell, 8 codes) per row —
  * nothing else; probes and LUTs are query-batch-sized broadcasts;
  * the cell equi-join replaces [[Pq.adcTopK]]'s corpus-wide cross
  * join, cutting the ADC traffic to nprobe/nlist of the corpus; only
  * shortlist ids shuffle. Store the code table partitioned by cell
  * and the probe join prunes partitions at the source.
  */
object IvfPq {

  /** Two-stage ANN over the routed code table. Output matches
    * [[Pq.adcTopK]]: (query_id, rank, neighbor_id, adist, edist). */
  def adcTopK(corpus: DataFrame, index: Ivf.Index,
              cents: Array[Array[Array[Long]]], queries: DataFrame,
              k: Int, rerank: Int, nprobe: Int,
              idCol: String = "vec_id", vecCol: String = "embedding")
  : DataFrame = {
    val cells = index.assigned
      .select(col(idCol).as("neighbor_id"), col("cell"))
    val encoded = Pq.encode(corpus, cents, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("codes"))
      .join(cells, "neighbor_id")
    val q = queries.filter(Similarity.finiteVec(col(vecCol)))
      .select(col(idCol).as("query_id"),
        Sq.micronize(col(vecCol)).as("qmv"))
      .withColumn("lut", Pq.lutExpr(col("qmv"), cents))
    val probes = Ivf.probeRanks(index, queries, idCol, vecCol)
      .filter(col("pr") <= nprobe).select("query_id", "cell")
    val approx = encoded
      .join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(q.select("query_id", "lut")), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.expressions.PqExpressions.pq_adc(col("codes"), col("lut"))
          .as("adist"))
    Pq.rerankTail(approx, corpus, q.select("query_id", "qmv"), k, rerank,
      idCol, vecCol)
  }

  /** Per-cell micro-unit centroid table (cell, cmv: array<bigint>) of
    * the index's FINAL assignment: cmv[d] = Σ v_micro[d] div n — the
    * exact-integer centroid the residual encoding subtracts. The
    * truncating `div` matches the trainers' discipline, and the ≤ 1
    * micro-unit flooring error is what buys back oracle replayability
    * that double-valued centroids would forfeit. nlist × dim longs —
    * a broadcast model. */
  def centroidsMicro(index: Ivf.Index, vecCol: String = "embedding")
  : DataFrame =
    index.assigned
      .select(col("cell"),
        posexplode(Sq.micronize(col(vecCol))).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(sum("x").as("sm"), count(lit(1)).as("n"))
      .groupBy("cell")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"),
          expr("sm div n").as("cm")))),
        s => s.getField("cm")).as("cmv"))

  /** RESIDUAL IVF-PQ (Jégou et al. 2011, the default FAISS
    * `IndexIVFPQ` encoding): PQ codes are learned over r = v − c(v)
    * (each vector minus its cell centroid) instead of raw vectors —
    * residuals concentrate near zero, so the same ksub codebook spends
    * its centroids on a much tighter distribution and the ADC
    * approximation sharpens. The integer-micro discipline survives by
    * flooring the centroid itself to micro units ([[centroidsMicro]]):
    * residuals are exact BIGINT differences, the PQ trainer runs
    * unchanged on them, and the whole index replays in the oracle.
    *
    * The query-side cost of residual encoding: the ADC LUT depends on
    * the PROBED CELL (it is built from q − c(cell)), so each query
    * carries nprobe LUTs instead of one — still a query-batch-sized
    * broadcast. Exact re-rank runs on RAW vectors, as always.
    */
  def residualAdcTopK(corpus: DataFrame, index: Ivf.Index,
                      queries: DataFrame, m: Int, ksub: Int, iters: Int,
                      k: Int, rerank: Int, nprobe: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    // eager pin (the Sq.fit / LangModel discipline): cm feeds the
    // corpus-side residuals (rv → trainer AND codes) and the
    // query-side residuals (qres broadcast) — unpinned, each of those
    // consumers replays the full-corpus centroid aggregation. nlist
    // rows of dim longs: model-sized at any corpus scale.
    val cm = centroidsMicro(index, vecCol).localCheckpoint(true)
    val rv = index.assigned
      .select(col(idCol).as("id"), col("cell"),
        Sq.micronize(col(vecCol)).as("mv0"))
      .join(broadcast(cm), "cell")
      .select(col("id"), col("cell"),
        zip_with(col("mv0"), col("cmv"), (a, b) => a - b).as("mv"))
    val rcents = Pq.trainCheckedMicro(rv.select("id", "mv"), m, ksub, iters)
    val codes = rv.select(col("id").as("neighbor_id"), col("cell"),
      Pq.codesExpr(col("mv"), rcents).as("codes"))
    val probes = Ivf.probeRanks(index, queries, idCol, vecCol)
      .filter(col("pr") <= nprobe).select("query_id", "cell")
    val qm = queries.filter(Similarity.finiteVec(col(vecCol)))
      .select(col(idCol).as("query_id"),
        Sq.micronize(col(vecCol)).as("qmv"))
    val qres = probes
      .join(broadcast(qm), "query_id")
      .join(broadcast(cm), "cell")
      .select(col("query_id"), col("cell"),
        zip_with(col("qmv"), col("cmv"), (a, b) => a - b).as("qrv"))
      .withColumn("lut", Pq.lutExpr(col("qrv"), rcents))
      .select("query_id", "cell", "lut")
    val approx = codes.join(broadcast(qres), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.expressions.PqExpressions.pq_adc(col("codes"), col("lut"))
          .as("adist"))
    Pq.rerankTail(approx, corpus, qm, k, rerank, idCol, vecCol)
  }
}

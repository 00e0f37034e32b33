package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-PQ: the production FAISS index shape — a coarse IVF quantizer
  * routes each query to its `nprobe` nearest cells, and ONLY those
  * cells' PQ codes pay the ADC scan; an exact integer re-rank of the
  * shortlist closes the accuracy gap. Composes the two checked
  * trainers ([[Ivf.trainChecked]], [[Pq.trainChecked]]) unchanged.
  *
  * Codes are over RAW vectors, not residuals: the integer-micro
  * discipline that makes both trainers oracle-replayable would break
  * at the double-valued residual subtraction (checked centroids are
  * micro-sum / n doubles). FAISS ships this variant too; residual
  * encoding belongs to the float fast path with [[Ivf.train]].
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
    val q = queries.select(col(idCol).as("query_id"),
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
}

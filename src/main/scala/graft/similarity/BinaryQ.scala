package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary (sign-bit) quantization ANN — the 1-bit-per-dimension code
  * behind "binary embeddings" retrieval tiers: bit d is the sign of
  * coordinate d, distance is Hamming (XOR + popcount), and an exact
  * re-rank over the shortlist restores float-grade precision. The
  * crudest quantizer in the family (SQ q107 keeps 8 bits/dim, PQ
  * q172 ~1 bit/dim learned) but the cheapest by far: 64 dims → two
  * 32-bit words per vector, no training, and the scan's distance is
  * two XOR+popcounts — memory-bandwidth speed.
  *
  * Codes are split into two 32-bit halves rather than one 64-bit
  * word: bit 63 of a single-long code would need 2^63, which
  * overflows BIGINT under ANSI arithmetic in both engines; two
  * halves keep every term exact with zero cost (Hamming adds).
  *
  * 100 TB shape: the corpus scan reads (id, lo, hi) — 16-ish bytes a
  * row; queries broadcast; only shortlist ids shuffle into the
  * re-rank, which reads full vectors for shortlist rows alone.
  */
object BinaryQ {

  /** Sign bits of micro coordinates [32h+1 .. 32h+32] packed into one
    * BIGINT (bit d of the half = coordinate 32h+d+1 > 0). */
  private def half(mv: Column, h: Int): Column =
    aggregate(sequence(lit(0L), lit(31L)), lit(0L), (acc, d) =>
      acc + when(
        element_at(mv, (d + lit(32L * h) + lit(1L)).cast("int")) > 0,
        pow(lit(2.0), d.cast("double")).cast("long")).otherwise(lit(0L)))

  /** Binary code table: (idCol, lo, hi) for 64-dim vectors. */
  def codes(df: DataFrame, idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame =
    df.filter(Similarity.finiteVec(col(vecCol)))
      .select(col(idCol),
        // half() hardcodes two 32-bit halves; a dim != 64 corpus would
        // silently sign-encode the out-of-range tail as 0 via null
        // element_at, so fail loudly instead of emitting wrong codes
        when(size(col(vecCol)) === 64, Sq.micronize(col(vecCol)))
          .otherwise(raise_error(concat(
            lit("BinaryQ.codes: expected 64-dim embedding, got dim="),
            size(col(vecCol)).cast("string")))).as("mv"))
      .select(col(idCol), half(col("mv"), 0).as("lo"),
        half(col("mv"), 1).as("hi"))

  /** Hamming-shortlisted exact top-k. Output matches the other ANN
    * paths: (query_id, rank, neighbor_id, adist, edist) with adist =
    * the Hamming distance of the binary codes. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, rerank: Int,
           idCol: String = "vec_id", vecCol: String = "embedding")
  : DataFrame = {
    val c = codes(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("lo"), col("hi"))
    val q = codes(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"),
        col("lo").as("qlo"), col("hi").as("qhi"))
    val qm = queries.filter(Similarity.finiteVec(col(vecCol)))
      .select(col(idCol).as("query_id"),
        Sq.micronize(col(vecCol)).as("qmv"))
    val approx = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
          bit_count(col("hi").bitwiseXOR(col("qhi")))).cast("long")
          .as("adist"))
    Pq.rerankTail(approx, corpus, qm, k, rerank, idCol, vecCol)
  }
}

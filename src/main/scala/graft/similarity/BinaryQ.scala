package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary (sign-bit) quantization ANN — the 1-bit-per-dimension code
  * behind "binary embeddings" retrieval tiers: bit d is the sign of
  * coordinate d, distance is Hamming (XOR + popcount), and an exact
  * re-rank over the shortlist restores float-grade precision. The
  * crudest quantizer in the family (SQ q107 keeps 8 bits/dim, PQ
  * q172 ~1 bit/dim learned) but the cheapest by far: d dims →
  * ⌈d/32⌉ 32-bit words per vector, no training, and the scan's
  * distance is a word-wise XOR+popcount fold — memory-bandwidth
  * speed.
  *
  * Codes pack 32 bits per BIGINT word rather than 64: bit 63 of a
  * full 64-bit word would need 2^63, which overflows BIGINT under
  * ANSI arithmetic in both engines; half-full words keep every term
  * exact with zero cost (the Hamming fold is the same adds). The
  * word COUNT derives from the vector length, so any fixed
  * dimensionality works — 32, 48, 384, 1024 — without code changes
  * (q207 runs the 64-dim corpus, q215 a 48-dim slice of it).
  *
  * 100 TB shape: the corpus scan reads (id, code[⌈d/32⌉]) — ~d/8
  * bytes a row; queries broadcast; only shortlist ids shuffle into
  * the re-rank, which reads full vectors for shortlist rows alone.
  */
object BinaryQ {

  /** The full sign-bit code: ⌈size/32⌉ words, little-endian in both
    * senses (word 0 = dims 1–32, bit 0 = first dim of the word).
    * Native codegen'd single loop ([[graft.expressions.BitPack]]) —
    * the round-8 HOF form (transform over a 32-term aggregate per
    * word) interpreted ~2·d lambda nodes per row and cost q207 4.8×. */
  def pack(mv: Column): Column = graft.expressions.BinaryQExpressions.bit_pack(mv)

  /** Binary code table: (idCol, code) for any fixed-dim corpus. */
  def codes(df: DataFrame, idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame =
    df.filter(Similarity.finiteVec(col(vecCol)))
      .select(col(idCol), pack(Sq.micronize(col(vecCol))).as("code"))

  /** Hamming distance of two packed codes as BIGINT — a word-wise
    * XOR+popcount loop, codegen'd ([[graft.expressions.HammingDist]]);
    * exact for any word count. */
  def hamming(a: Column, b: Column): Column =
    graft.expressions.BinaryQExpressions.hamming_dist(a, b)

  /** Asymmetric distance (the ADC idea applied to the sign-bit
    * quantizer): the QUERY keeps full precision (integer micro units)
    * while the corpus contributes only its stored bits — adist =
    * −Σ_d q_d·s_d with s_d = 2·bit_d − 1 ∈ {−1, +1}. Exact BIGINT end
    * to end (products of micro units by ±1, order-free sum), and a
    * strictly more informed shortlist than symmetric Hamming at
    * IDENTICAL corpus bytes: the query's magnitudes weight every
    * dimension instead of counting sign flips equally. Bit addressing
    * is shift arithmetic (d >> 5 word, d & 31 bit) — no division;
    * codegen'd per-pair loop ([[graft.expressions.BinaryAsymAdc]]). */
  def asymDist(code: Column, qmv: Column): Column =
    graft.expressions.BinaryQExpressions.binary_asym_adc(code, qmv)

  /** Asymmetric-shortlisted exact top-k: same corpus codes, same
    * output contract and re-rank tail as [[topK]], but the shortlist
    * ranks by [[asymDist]] — queries never quantize. */
  def topKAsymmetric(corpus: DataFrame, queries: DataFrame, k: Int,
                     rerank: Int, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val c = codes(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("code"))
    val qm = queries.filter(Similarity.finiteVec(col(vecCol)))
      .select(col(idCol).as("query_id"), Sq.micronize(col(vecCol)).as("qmv"))
    val approx = c.crossJoin(broadcast(qm))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        asymDist(col("code"), col("qmv")).as("adist"))
    Pq.rerankTail(approx, corpus, qm, k, rerank, idCol, vecCol)
  }

  /** Hamming-shortlisted exact top-k. Output matches the other ANN
    * paths: (query_id, rank, neighbor_id, adist, edist) with adist =
    * the Hamming distance of the binary codes. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, rerank: Int,
           idCol: String = "vec_id", vecCol: String = "embedding")
  : DataFrame = {
    val c = codes(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("code"))
    val q = codes(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("code").as("qcode"))
    val qm = queries.filter(Similarity.finiteVec(col(vecCol)))
      .select(col(idCol).as("query_id"),
        Sq.micronize(col(vecCol)).as("qmv"))
    val approx = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        hamming(col("code"), col("qcode")).as("adist"))
    Pq.rerankTail(approx, corpus, qm, k, rerank, idCol, vecCol)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.similarity.BinaryQ
import graft.text.Novelty

/** Hand-computed pins for the round-8 operators: asymmetric binary
  * ADC and ingest novelty. */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("asymDist: query magnitudes weight corpus sign bits exactly") {
    // corpus vector signs (+,−,+,−,…) over 33 dims (two words, second
    // word 1 live bit); query [1.0, 2.0, …] micronizes to d·10⁶
    val dim = 33
    val cvec = Array.tabulate(dim)(d => if (d % 2 == 0) 0.5f else -0.5f)
    val qvec = Array.tabulate(dim)(d => (d + 1).toFloat)
    val df = Seq((0L, cvec)).toDF("vec_id", "embedding")
    val code = BinaryQ.codes(df).select("code").collect().head.getSeq[Long](0)
    assert(code.length === 2)
    val q = Seq((1L, qvec)).toDF("vec_id", "embedding")
      .select(graft.similarity.Sq.micronize(col("embedding")).as("qmv"))
    val got = df.select(BinaryQ.pack(
        graft.similarity.Sq.micronize(col("embedding"))).as("code"))
      .crossJoin(q)
      .select(BinaryQ.asymDist(col("code"), col("qmv")).as("a"))
      .collect().head.getLong(0)
    // s_d = +1 for even d (bit set), −1 for odd; q_d = (d+1)·10⁶
    val want = -(0 until dim).map(d => (d + 1).toLong * 1000000L *
      (if (d % 2 == 0) 1 else -1)).sum
    assert(got === want)
  }

  test("asymmetric shortlist outranks symmetric Hamming where magnitudes matter") {
    // query [9, 1, 1, 1]: one dominant dimension. Corpus A agrees on
    // the dominant sign and flips the three small ones; B flips the
    // dominant sign and agrees on the small ones. Symmetric Hamming
    // counts flips equally (A = 3, B = 1 -> shortlists B); the
    // asymmetric score weights by the query's magnitudes
    // (A = +6e6, B = -6e6 -> shortlists A) — and A IS the true
    // nearest, so at rerank = 1 only the asymmetric tier finds it
    // from identical corpus bytes.
    val corpus = Seq(
      (0L, Array(5f, -5f, -5f, -5f)),  // true nearest
      (1L, Array(-5f, 5f, 5f, 5f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(9f, 1f, 1f, 1f))).toDF("vec_id", "embedding")
    val asym = BinaryQ.topKAsymmetric(corpus, queries, k = 1, rerank = 1)
      .collect().head
    val sym = BinaryQ.topK(corpus, queries, k = 1, rerank = 1)
      .collect().head
    assert(asym.getAs[Long]("neighbor_id") === 0L,
      "magnitude-weighted shortlist must surface the true nearest")
    assert(sym.getAs[Long]("neighbor_id") === 1L,
      "flip-counting shortlist provably cannot (3 flips vs 1)")
  }

  test("ingest novelty: batch grams scored against the standing corpus only") {
    val docs = Seq(
      (1L, "a b c d", false), // standing: "a b c", "b c d"
      (2L, "c d e f", false), // standing: "c d e", "d e f"
      (3L, "a b c x", true),  // batch: "a b c" known, "b c x" new -> 1/2
      (4L, "p q r s", true))  // batch: both new -> 1.0
      .toDF("doc_id", "text", "is_new")
    val items = graft.text.TextAnalysis.ngrams(
      graft.text.TextAnalysis.tokens(col("text")), 3)
    val r = Novelty.ingestNovelty(docs, col("doc_id"), items, col("is_new"))
      .orderBy("doc_id").collect()
    assert(r.length === 2, "only batch rows are scored")
    assert(r(0).getLong(0) === 3L && r(0).getLong(2) === 1L &&
      r(0).getLong(3) === 500000L)
    assert(r(1).getLong(0) === 4L && r(1).getLong(2) === 2L &&
      r(1).getLong(3) === 1000000L)
  }
}

package graft

import org.apache.spark.sql.functions._

/** Bigram-LM perplexity scoring pinned on hand-computable corpora. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("perplexityBits: hand-computed add-k bigram model on one doc") {
    // "a b a b a": bigrams ab,ba,ab,ba -> c12 = 2 each, c1(a) = c1(b) = 2,
    // V = 2, k = 0.5 -> every p = 2.5/3, log2 = -0.263034 to 6dp
    val docs = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val got = graft.text.LangModel
      .perplexityBits(docs, docs, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].head()
    assert(got === ((1L, 4L, 0.263034)))
  }

  test("perplexityBits: uniform continuations hit exactly 1 bit; short docs omitted") {
    // c1(a) = 2, c12(aa) = c12(ab) = 1, V = 2 -> both p = 1.5/3 = 0.5
    val docs = Seq((1L, "a a"), (2L, "a b")).toDF("doc_id", "text")
    val got = graft.text.LangModel
      .perplexityBits(docs, docs, col("doc_id"), col("text"))
      .orderBy("id").as[(Long, Long, Double)].collect()
    assert(got === Array((1L, 1L, 1.0), (2L, 1L, 1.0)))
    // a 1-token doc has no bigrams: absent from the output, but its
    // token still widens V for everyone else
    val withShort = Seq((1L, "a a"), (2L, "a b"), (3L, "z"))
      .toDF("doc_id", "text")
    val s = graft.text.LangModel
      .perplexityBits(withShort, withShort, col("doc_id"), col("text"))
      .orderBy("id").as[(Long, Long, Double)].collect()
    assert(s.map(_._1).toSeq === Seq(1L, 2L))
    assert(s.forall(_._3 > 1.0)) // V = 3 smooths every p below 1/2
  }

  test("bigramLm: model table is type-level and reusable") {
    val docs = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val lm = graft.text.LangModel
      .bigramLm(docs, col("doc_id"), col("text"))
      .orderBy("gram").as[(String, Long)].collect()
    assert(lm === Array(("a b", -263034L), ("b a", -263034L)))
  }
}

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

  test("stupidBackoffBits: every back-off branch hand-checked") {
    // train: trigrams {a b c: 2, b c a: 1, c a b: 1}; bigrams
    // {a b: 2, b c: 2, c a: 1}; unigrams {a: 2, b: 2, c: 2}, N = 6
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c d"), // "a b c" direct (2/2 -> lp 0); "b c d" dropped
      (2L, "b c a b"), // direct 1/2 (lp -1e6) + direct 1/1 (lp 0)
      (3L, "a a b"),   // trigram miss, bigram "a b" hit: 0.4*2/2 = 0.4
      (4L, "a c b"))   // trigram+bigram miss, unigram b: 0.4^2 * 2/6
      .toDF("doc_id", "text")
    val got = graft.text.LangModel
      .stupidBackoffBits(score, train, col("doc_id"), col("text"))
      .orderBy("id")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // (n_trigrams, n_direct, n_bo2, n_bo1, n_dropped)
    assert(got.map(r => (r._2, r._3, r._4, r._5, r._6)).toSeq == Seq(
      (2L, 1L, 0L, 0L, 1L), (2L, 2L, 0L, 0L, 0L),
      (1L, 0L, 1L, 0L, 0L), (1L, 0L, 0L, 1L, 0L)))
    assert(got(0)._7 == 0.0) // the one scored trigram has S = 1
    assert(got(1)._7 == 0.5) // mean of (1, -1e6) micro-bits
    assert(got(2)._7 == 1.321928) // -log2(0.4)
    val expU = -math.round(math.log(0.4 * 0.4 * 2.0 / 6.0) /
      math.log(2.0) * 1e6) / 1e6
    assert(math.abs(got(3)._7 - expU) < 1e-6)
  }

  test("stupidBackoffBits: docs with <3 tokens drop out, no index error") {
    // sequence(1, 0) in Spark steps -1 and yields [1, 0] — the guard
    // must map short docs to zero trigrams (oracle generate_series is
    // empty), not throw on element_at(tk, 0) or emit bogus 2-grams.
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a"), (2L, "a b"), (3L, ""), (4L, "a b c"))
      .toDF("doc_id", "text")
    val got = graft.text.LangModel
      .stupidBackoffBits(score, train, col("doc_id"), col("text"))
      .orderBy("id")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    // only the 3-token doc has a trigram row
    assert(got.map(_._1).toSeq == Seq(4L))
    assert(got(0)._2 == 1L && got(0)._3 == 1L)
  }

  test("domainExcessWeights: weights normalize; distinct domain upweights over its base share") {
    // domain x: internally repetitive + unlike y/z -> its specialist LM
    // beats the generalist by a wide margin (high excess). y and z share
    // a distribution, so their specialists add little (low excess).
    val docs = Seq(
      (1L, "x", "red red red red red blue"),
      (2L, "x", "red red red red blue red"),
      (3L, "y", "one two three four five six"),
      (4L, "y", "two three four five six one"),
      (5L, "z", "three four five six one two"),
      (6L, "z", "four five six one two three"))
      .toDF("doc_id", "source", "text")
    val w = graft.text.LangModel
      .domainExcessWeights(docs, col("doc_id"), col("text"), col("source"))
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(w.map(_._1).toSeq == Seq("x", "y", "z"))
    // every domain present, weights a distribution (within rounding)
    assert(math.abs(w.map(_._6).sum - 1.0) < 1e-4)
    val byDom = w.map(r => r._1 -> r).toMap
    // x's excess strictly above y's and z's, and its weight grows
    // relative to its base share; equal-mass y/z stay (near) symmetric
    assert(byDom("x")._4 > byDom("y")._4 && byDom("x")._4 > byDom("z")._4)
    assert(byDom("x")._6 > byDom("x")._5)
    assert(math.abs(byDom("y")._6 - byDom("z")._6) < 1e-3)
  }
}

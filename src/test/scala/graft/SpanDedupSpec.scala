package graft

import org.apache.spark.sql.functions._

import graft.text.SpanDedup

/** Pins the exact duplicated-span semantics (q175) on crafted corpora
  * where the suffix-array answer is computable by hand. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val L = 4

  private def census(docs: Seq[(Long, String)]) =
    SpanDedup.census(docs.toDF("doc_id", "text"), col("doc_id"), col("text"), L)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("a shared passage is found at DIFFERENT offsets in each doc") {
    // 6-token passage "p1 p2 p3 p4 p5 p6" at offset 0 in doc 1, offset 3
    // in doc 2 — line-aligned chunking would miss this; span dedup
    // reports exactly the 6 shared tokens in both docs.
    val out = census(Seq(
      1L -> "p1 p2 p3 p4 p5 p6 x1 x2 x3 x4",
      2L -> "y1 y2 y3 p1 p2 p3 p4 p5 p6 z1"))
    assert(out === Seq(
      (1L, 10L, 1L, 6L, 6L, 600000L),
      (2L, 10L, 1L, 6L, 6L, 600000L)))
  }

  test("self-repetition inside ONE doc counts as duplication") {
    // "r1 r2 r3 r4" appears twice in the same doc: both occurrences are
    // duplicated spans; the gap (> L) keeps them separate maximal spans.
    val out = census(Seq(
      1L -> "r1 r2 r3 r4 a1 a2 a3 a4 a5 r1 r2 r3 r4"))
    assert(out === Seq((1L, 13L, 2L, 8L, 4L, 615384L)))
  }

  test("overlapping windows merge into ONE maximal span") {
    // A shared 7-token passage yields 4 duplicated L=4 windows at
    // offsets 0..3 — they must merge to a single span of 7, not four
    // spans of 4.
    val out = census(Seq(
      1L -> "s1 s2 s3 s4 s5 s6 s7 u1 u2 u3",
      2L -> "v1 v2 s1 s2 s3 s4 s5 s6 s7 w1"))
    assert(out.map(_._3).toSeq === Seq(1L, 1L), "one maximal span per doc")
    assert(out.map(_._4).toSeq === Seq(7L, 7L), "span covers all 7 tokens")
  }

  test("docs with no duplication report zeros; short docs emit no windows") {
    val out = census(Seq(
      1L -> "a b c d e f g h",
      2L -> "q r s", // shorter than L: no windows, zeros
      3L -> "m n o p q r s t"))
    assert(out === Seq(
      (1L, 8L, 0L, 0L, 0L, 0L),
      (2L, 3L, 0L, 0L, 0L, 0L),
      (3L, 8L, 0L, 0L, 0L, 0L)))
  }

  test("rolling_token_hash equals the direct polynomial at every window") {
    import graft.expressions.RollingHash.rolling_token_hash
    val B = 0x100000001b3L
    val hs = Seq(7L, -3L, 42L, Long.MaxValue, 0L, 19L, -8881L)
    val L2 = 3
    val expect = hs.sliding(L2).map(_.foldLeft(0L)((a, h) => a * B + h)).toSeq
    val got = Seq(Tuple1(hs)).toDF("th")
      .select(rolling_token_hash(col("th"), L2).as("r"))
      .head().getSeq[Long](0)
    assert(got === expect)
    // shorter than the window: empty result, not null, not an error
    val short = Seq(Tuple1(Seq(1L, 2L))).toDF("th")
      .select(rolling_token_hash(col("th"), L2).as("r"))
      .head().getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("censusFast (native rolling hash) ≡ census (md5) on real documents") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val a = graft.text.SpanDedup
      .census(docs, col("doc_id"), col("text"), 8).orderBy("doc_id").collect()
    val b = graft.text.SpanDedup
      .censusFast(docs, col("doc_id"), col("text"), 8).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.exists(_.getLong(2) > 0L), "corpus must actually contain dup spans")
  }

  test("rewrite keeps the corpus-wide FIRST occurrence, cuts the rest") {
    import org.apache.spark.sql.functions.md5
    val docs = Seq(
      1L -> "p1 p2 p3 p4 x1 x2",
      2L -> "y1 y2 p1 p2 p3 p4") // later occurrence -> span cut
    val out = graft.text.SpanDedup
      .rewrite(docs.toDF("doc_id", "text"), col("doc_id"), col("text"), L)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) === 0L, "first occurrence untouched")
    assert(out(1).getLong(2) === 4L, "later occurrence removed")
    val fp1 = spark.range(1).select(md5(lit("p1 p2 p3 p4 x1 x2"))).head.getString(0)
    val fp2 = spark.range(1).select(md5(lit("y1 y2"))).head.getString(0)
    assert(out(0).getString(3) === fp1)
    assert(out(1).getString(3) === fp2)
  }

  test("rewrite of a fully-duplicated document leaves the empty fingerprint") {
    import org.apache.spark.sql.functions.md5
    val docs = Seq(
      1L -> "q1 q2 q3 q4",
      2L -> "q1 q2 q3 q4")
    val out = graft.text.SpanDedup
      .rewrite(docs.toDF("doc_id", "text"), col("doc_id"), col("text"), L)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) === 0L)
    assert(out(1).getLong(2) === 4L)
    val empty = spark.range(1).select(md5(lit(""))).head.getString(0)
    assert(out(1).getString(3) === empty)
  }

  test("spans straddling a gap > L stay separate; gap <= L merges") {
    // doc 1 and doc 2 share tokens 0..3 and 8..11 (gap of 4 fresh
    // tokens between window starts 0 and 8 -> 8 - 0 > L so only if the
    // middle tokens differ do we get two spans).
    val out = census(Seq(
      1L -> "c1 c2 c3 c4 g1 g2 g3 g4 d1 d2 d3 d4",
      2L -> "c1 c2 c3 c4 h1 h2 h3 h4 d1 d2 d3 d4"))
    assert(out.map(_._3).toSeq === Seq(2L, 2L), "two separate maximal spans")
    assert(out.map(_._4).toSeq === Seq(8L, 8L))
    assert(out.map(_._5).toSeq === Seq(4L, 4L))
  }
}

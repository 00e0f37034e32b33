package graft

import org.apache.spark.sql.functions._

import graft.text.Bm25

/** Pins BM25 ranking semantics (q176) on corpora where the correct
  * order is known by construction. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def rank(docs: Seq[(Long, String)], isQuery: Long => Boolean) =
    Bm25.topK(docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
      col("doc_id").isin(docs.map(_._1).filter(isQuery): _*), k = 10)
      .orderBy("query_id", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("more matching query terms outranks fewer") {
    val out = rank(Seq(
      0L -> "alpha beta gamma delta",
      1L -> "alpha beta gamma zz yy xx", // 3 query terms
      2L -> "alpha beta qq rr ss tt", //    2 query terms
      3L -> "alpha mm nn oo pp qq"), //     1 query term
      _ == 0L)
    assert(out.map(_._3).toSeq === Seq(1L, 2L, 3L),
      "candidates must rank by matched-term weight")
    assert(out.forall(_._4 > 0L), "every match carries a positive score")
  }

  test("equal tf: the SHORTER document ranks first (length normalization)") {
    val filler = (1 to 20).map(i => s"f$i").mkString(" ")
    val out = rank(Seq(
      0L -> "needle one two",
      1L -> s"needle $filler", // long doc, tf(needle)=1
      2L -> "needle short doc"), // short doc, tf(needle)=1
      _ == 0L)
    assert(out.map(_._3).toSeq === Seq(2L, 1L),
      "b=0.75 must penalize the longer document at equal tf")
  }

  test("rare terms outweigh common ones at equal tf and length") {
    // "rare" appears in 2 docs, "common" in all 5: the doc matching
    // the rare term must outrank the doc matching the common term.
    val out = rank(Seq(
      0L -> "rare common",
      1L -> "rare aa bb cc",
      2L -> "common aa bb cc",
      3L -> "common dd ee ff",
      4L -> "common gg hh ii"),
      _ == 0L)
    assert(out.head._3 === 1L, "idf must favor the rare-term match")
  }

  test("scores are deterministic across runs") {
    val docs = (0L until 40L).map(i =>
      i -> s"w${i % 7} w${i % 11} w${i % 13} w${i % 3} tail$i")
    val a = rank(docs, _ < 2L)
    val b = rank(docs, _ < 2L)
    assert(a.sameElements(b))
  }
}

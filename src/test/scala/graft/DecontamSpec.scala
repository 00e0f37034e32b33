package graft

import graft.text.Decontam

class DecontamSpec extends SparkSpec {

  lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a QUICK Brown fox JUMPS over something else entirely"), // case-folds to a hit
      (3L, "completely unrelated text about spark partitions and shuffles"),
      (4L, "short doc") // shorter than n — emits no grams, never errors
    ).toDF("doc_id", "text")
  }

  lazy val bench = {
    import spark.implicits._
    Seq(
      Tuple1("quick brown fox jumps over the fence"),
      Tuple1("spark partitions are immutable")
    ).toDF("text")
  }

  test("contaminationReport flags docs sharing an n-gram, case-insensitively") {
    val got = Decontam.contaminationReport(docs, bench, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shares "quick brown fox", "brown fox jumps", "fox jumps over",
    // "jumps over the"; doc 2 (after lowercasing) the first three; docs
    // 3 and 4 share nothing ("spark partitions and" is not a bench gram)
    assert(got === Map(1L -> 4L, 2L -> 3L))
  }

  test("shuffle-join fallback matches the broadcast path") {
    val a = Decontam.contaminationReport(docs, bench, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Decontam.contaminationReport(docs, bench, n = 3, broadcastBench = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("duplicate grams in a doc count once") {
    import spark.implicits._
    val d = Seq((7L, "ha ha ha ha ha ha")).toDF("doc_id", "text")
    val bm = Seq(Tuple1("ha ha ha")).toDF("text")
    val got = Decontam.contaminationReport(d, bm, n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(7L -> 1L)) // one distinct gram despite 4 occurrences
  }
}

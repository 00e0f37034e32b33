package graft

import org.apache.spark.sql.functions._

import graft.text.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 256 // small bucket table keeps the toy spec fast
  private lazy val docs = Tables.load(spark, TestSpark.sf0001, "documents")
  private lazy val model =
    Dsir.fit(docs, col("doc_id"), col("text"), col("lang") === "en", B)

  test("model is bucket-sized with a real signal") {
    val rows = model.collect()
    assert(rows.length <= B)
    assert(rows.map(_.getLong(1)).exists(_ != 0L),
      "every llr is zero — target and raw distributions can't be identical")
  }

  test("scores are deterministic and integer-exact across runs") {
    val a = Dsir.scores(docs, col("doc_id"), col("text"), model, B)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Dsir.scores(docs, col("doc_id"), col("text"), model, B)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }

  test("target-slice docs outscore the rest on average") {
    val sc = Dsir.scores(docs, col("doc_id"), col("text"), model, B)
    val byLang = docs.select(col("doc_id").as("id"), col("lang"))
      .join(sc, "id")
      .groupBy(col("lang") === "en").agg(avg("score_micro"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"importance weights carry no domain signal: $byLang")
  }

  test("docs with no bigrams score exactly zero") {
    val tiny = Seq((1L, "single"), (2L, "two tokens")).toDF("doc_id", "text")
    val sc = Dsir.scores(tiny, col("doc_id"), col("text"), model, B)
      .orderBy("id").collect()
    assert(sc(0).getLong(1) === 0L, "one-token doc must score 0")
  }

  test("q174 selects exactly n/5 documents") {
    val out = graft.queries.Curation
      .q174_dsir_select(spark, TestSpark.sf0001).collect()
    val n = out.length
    assert(out.count(_.getBoolean(3)) === n / 5)
    // selected docs all outscore unselected ones up to the doc_id tie
    val selMin = out.filter(_.getBoolean(3)).map(_.getLong(2)).min
    val unselMax = out.filterNot(_.getBoolean(3)).map(_.getLong(2)).max
    assert(selMin >= unselMax - 0L || selMin >= unselMax,
      s"selection is not a top-k by score: min(sel)=$selMin max(unsel)=$unselMax")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.text.Topics

/** Pins the c-TF-IDF topic-labeling invariants (q178). */
class TopicsSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, TestSpark.sf0001, "documents")
  private lazy val embeds = Tables.load(spark, TestSpark.sf0001, "embeddings")
  private lazy val out = Topics.topTerms(docs, embeds, dim = 64,
    signBits = 3, seed = 42L, k = 5).orderBy("cluster", "rank").collect()

  test("ranks are contiguous from 1 with at most k terms per cluster") {
    val byCluster = out.groupBy(_.getLong(0))
    byCluster.foreach { case (c, rows) =>
      val ranks = rows.map(_.getLong(2)).sorted.toSeq
      assert(ranks === (1L to ranks.length), s"cluster $c ranks $ranks")
      assert(ranks.length <= 5)
    }
    assert(byCluster.nonEmpty)
  }

  test("cluster sizes cover the whole corpus exactly once") {
    val sizes = out.groupBy(_.getLong(0))
      .map { case (_, rows) => rows.head.getLong(1) }
    assert(sizes.sum === embeds.count())
  }

  test("scores decrease with rank and are exact tf*idf integers") {
    out.groupBy(_.getLong(0)).foreach { case (c, rows) =>
      val scores = rows.sortBy(_.getLong(2)).map(_.getLong(5)).toSeq
      assert(scores === scores.sorted.reverse, s"cluster $c not descending")
    }
    // spot-check one row: score_micro = tf_c * round(1e6 * ln(1 + N/df))
    val n = docs.count().toDouble
    val r = out.head
    val token = r.getString(3)
    val df = docs.select(explode(graft.text.TextAnalysis
        .tokens(lower(col("text")))).as("t"), col("doc_id"))
      .filter(col("t") === token).select("doc_id").distinct().count()
    val idfMicro = math.rint(1e6 * math.log(1.0 + n / df)).toLong
    assert(r.getLong(5) === r.getLong(4) * idfMicro)
  }

  test("deterministic across runs") {
    val again = Topics.topTerms(docs, embeds, dim = 64, signBits = 3,
      seed = 42L, k = 5).orderBy("cluster", "rank").collect()
    assert(out.sameElements(again))
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.Corpus

/** Corpus analytics queries (vocabulary / n-grams / TF-IDF). */
object CorpusQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q45
  // Corpus vocabulary: top-20 tokens by total count.
  val q45_vocab: Q = (s, dir) =>
    Corpus.vocabulary(Tables.load(s, dir, "documents"), col("doc_id"), col("text"))
      .orderBy(col("n_total").desc, col("token").asc)
      .limit(20)

  val q45_sql: String =
    """WITH t AS (SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token
      |           FROM documents)
      |SELECT token, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
      |FROM t GROUP BY token
      |ORDER BY n_total DESC, token ASC LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q46
  // Corpus bigram counts: top-20.
  val q46_bigrams: Q = (s, dir) =>
    Corpus.ngramCounts(Tables.load(s, dir, "documents"), col("text"), 2)
      .orderBy(col("n").desc, col("ngram").asc)
      .limit(20)

  val q46_sql: String =
    """WITH a AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |g AS (SELECT UNNEST(list_transform(generate_series(1, len(toks) - 1),
      |        i -> toks[i] || ' ' || toks[i + 1])) AS ngram FROM a)
      |SELECT ngram, count(*) AS n FROM g GROUP BY ngram
      |ORDER BY n DESC, ngram ASC LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q47
  // TF-IDF: top-3 terms per document (first 50 docs), sklearn smoothing.
  val q47_tfidf: Q = (s, dir) => {
    val scores = Corpus.tfidf(Tables.load(s, dir, "documents"), col("doc_id"), col("text"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token").asc)
    scores.filter(col("doc_id") < 50)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("doc_id", "rank", "token", "tf", "df", "tfidf")
      .orderBy("doc_id", "rank")
  }

  val q47_sql: String =
    """WITH tok AS (SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token
      |             FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
      |dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
      |    round(tf.tf * (ln((1 + n.n_docs) * 1.0 / (1 + dfreq.df)) + 1), 6) AS tfidf
      |  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
      |ranked AS (
      |  SELECT doc_id, token, tf, df, tfidf,
      |    row_number() OVER (PARTITION BY doc_id
      |                       ORDER BY tfidf DESC, token ASC) AS rank
      |  FROM scored WHERE doc_id < 50)
      |SELECT doc_id, rank, token, tf, df, tfidf FROM ranked
      |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // ---------------------------------------------------------------- q49
  // Equal-width histogram: 20 buckets over the global [min, max] — the
  // profiling primitive; bounds from a broadcast 1-row aggregate.
  val q49_histogram: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    val bounds = li.agg(min(col("l_extendedprice")).as("lo"),
      max(col("l_extendedprice")).as("hi"))
    li.crossJoin(broadcast(bounds))
      .select(least(floor((col("l_extendedprice") - col("lo"))
        / ((col("hi") - col("lo")) / 20.0)), lit(19.0)).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  val q49_sql: String =
    """WITH s AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
      |           FROM lineitem)
      |SELECT CAST(least(floor((l_extendedprice - lo) / ((hi - lo) / 20.0)), 19.0)
      |            AS BIGINT) AS bucket,
      |  count(*) AS n
      |FROM lineitem, s GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q50
  // Sequence packing: documents → fixed 2048-token-budget batches in
  // exact doc_id order (graft.text.Packing; the sharded variant is the
  // parallel scale path, tested in PackingSamplingSpec).
  val q50_packing: Q = (s, dir) => {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(graft.text.TextAnalysis.tokens(col("text"))).as("n_tok"))
    graft.text.Packing.packSequential(d, col("n_tok"), 2048, Seq(col("doc_id")))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
      .orderBy("batch_id")
  }

  val q50_sql: String =
    """WITH t AS (SELECT doc_id,
      |             len(regexp_split_to_array(trim(text), '\s+')) AS n
      |           FROM documents),
      |r AS (SELECT doc_id, n,
      |        sum(n) OVER (ORDER BY doc_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
      |      FROM t)
      |SELECT CAST(floor((e - n) / 2048.0) AS BIGINT) AS batch_id,
      |  count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS total_tokens
      |FROM r GROUP BY batch_id ORDER BY batch_id""".stripMargin

  val all: Map[String, Q] = Map(
    "q45_vocab" -> q45_vocab,
    "q46_bigrams" -> q46_bigrams,
    "q47_tfidf" -> q47_tfidf,
    "q49_histogram" -> q49_histogram,
    "q50_packing" -> q50_packing)

  val oracle: Map[String, String] = Map(
    "q45_vocab" -> q45_sql,
    "q46_bigrams" -> q46_sql,
    "q47_tfidf" -> q47_sql,
    "q49_histogram" -> q49_sql,
    "q50_packing" -> q50_sql)
}

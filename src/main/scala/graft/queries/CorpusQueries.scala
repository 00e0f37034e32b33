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
      .withColumn("rank", row_number().over(w))
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

  val all: Map[String, Q] = Map(
    "q45_vocab" -> q45_vocab,
    "q46_bigrams" -> q46_bigrams,
    "q47_tfidf" -> q47_tfidf)

  val oracle: Map[String, String] = Map(
    "q45_vocab" -> q45_sql,
    "q46_bigrams" -> q46_sql,
    "q47_tfidf" -> q47_sql)
}

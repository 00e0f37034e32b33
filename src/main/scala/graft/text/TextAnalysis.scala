package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything here is pure `org.apache.spark.sql.functions` column
  * algebra (codegen'd, whole-stage-compatible): no UDFs, no driver-side
  * loops — each operator is a per-row expression that scales linearly
  * and never shuffles on its own.
  */
object TextAnalysis {

  /** Whitespace tokenizer (the "BPE-ish" split is [[bpeTokens]]). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish regex tokenizer: words, numbers, or single non-space
    * symbols — the standard pre-tokenization split used by GPT-style
    * byte-pair encoders. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Quality-scoring features per document (length / punctuation /
    * stopword ratios — the standard heuristic pre-filters for LLM
    * training corpora). All ratios are double, rounded to `scale` dp so
    * results are oracle-hashable. */
  def qualityFeatures(df: DataFrame, text: Column, scale: Int = 6,
                      stopwords: Seq[String] = defaultStopwords): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks)
    val stopArr = array(stopwords.map(lit): _*)
    val stopHits = size(filter(toks, t => array_contains(stopArr, lower(t))))
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    df.withColumn("n_chars", length(text))
      .withColumn("n_tokens", nTok)
      .withColumn("avg_token_len",
        round(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
          / nTok, scale))
      .withColumn("stopword_ratio", round(stopHits.cast("double") / nTok, scale))
      .withColumn("punct_ratio", round(punct.cast("double") / length(text), scale))
  }

  /** Stopword-profile language ID — per-language function-word
    * dictionaries; the predicted language is the profile with the most
    * token hits (ties broken by language code). A pure column expression:
    * per row O(tokens × langs), no shuffle, no UDF. */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de" -> Seq("der", "die", "und", "das", "in", "von", "zu", "den", "mit", "ist"),
    "pt" -> Seq("o", "a", "de", "que", "e", "do", "da", "em", "um", "para"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "他", "这", "不"))

  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    // struct(score, negated-lang-ordinal) and array_max picks the best;
    // ordinal tie-break keeps it deterministic.
    val langs = langProfiles.toSeq.sortBy(_._1)
    val scored = langs.zipWithIndex.map { case ((code, words), i) =>
      val dict = array(words.map(lit): _*)
      struct(
        size(filter(toks, t => array_contains(dict, t))).as("score"),
        lit(-i).as("ord"),
        lit(code).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** Whole-document fingerprint: stable 128-bit content hash of the
    * normalized text (lowercased, whitespace-collapsed). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling n-gram fingerprints: hash of every n-token shingle —
    * the winnowing/near-dup building block. Returns array<bigint>;
    * empty when the document has fewer than n tokens (a bare
    * `sequence(1, size-n+1)` would count DOWN for short docs and feed
    * slice() an illegal 0 index). */
  def shingleHashes(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => xxhash64(concat_ws(" ", slice(toks, i, lit(n))))))
  }
}

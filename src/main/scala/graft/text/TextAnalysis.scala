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
    // tokenize ONCE into its own projection — the split is the
    // expensive part and must not be inlined into every consumer
    val toksCol = col("__toks")
    val nTok = size(toksCol)
    val stopHits = graft.expressions.TokenSetCount(toksCol, stopwords.toSet, lowercase = true)
    val punct = length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    // zero-denominator docs (empty/whitespace-only text) get null
    // ratios instead of an ANSI DIVIDE_BY_ZERO — the gate treats null
    // as failing, which is the right verdict for an empty document
    df.withColumn("__toks", tokens(text))
      .withColumns(Map(
        "n_chars" -> length(text),
        "n_tokens" -> nTok,
        "avg_token_len" -> when(nTok > 0,
          round(aggregate(toksCol, lit(0L), (acc, t) => acc + length(t)).cast("double")
            / nTok, scale)),
        "stopword_ratio" -> when(nTok > 0,
          round(stopHits.cast("double") / nTok, scale)),
        "punct_ratio" -> when(length(text) > 0,
          round(punct.cast("double") / length(text), scale))))
      .drop("__toks")
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

  /** Language ID over a pre-tokenized column (tokenize once upstream —
    * see [[withLangId]]). struct(score, negated-lang-ordinal) and
    * array_max pick the best profile; ordinal tie-break keeps it
    * deterministic. Scoring is the native TokenSetCount probe (one
    * pass per language, O(1) lookups). */
  def langIdFromTokens(toks: Column): Column = {
    val langs = langProfiles.toSeq.sortBy(_._1)
    val scored = langs.zipWithIndex.map { case ((code, words), i) =>
      struct(
        graft.expressions.TokenSetCount(toks, words.toSet, lowercase = true)
          .as("score"),
        lit(-i).as("ord"),
        lit(code).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** df + `pred_lang`, tokenizing once in its own projection. */
  def withLangId(df: DataFrame, text: Column): DataFrame =
    df.withColumn("__toks", tokens(text))
      .withColumn("pred_lang", langIdFromTokens(col("__toks")))
      .drop("__toks")

  /** Whole-document fingerprint: stable 128-bit content hash of the
    * normalized text (lowercased, whitespace-collapsed). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** All n-token grams of a token array, space-joined: built by zipping
    * the array with its k-shifted selves (zip_with pads the tail with
    * nulls, concat propagates them, array_compact drops them) — one
    * fused pass, no per-position indexed access, empty for short docs. */
  def ngrams(toks: Column, n: Int): Column =
    if (n == 1) toks
    else array_compact(
      (1 until n).foldLeft(toks) { (acc, k) =>
        zip_with(acc, slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0))),
          (x, y) => concat(x, lit(" "), y))
      })

  /** Rolling n-gram fingerprints: hash of every n-token shingle —
    * the winnowing/near-dup building block. Returns array<bigint>;
    * empty when the document has fewer than n tokens. */
  def shingleHashes(text: Column, n: Int): Column =
    transform(ngrams(tokens(text), n), g => xxhash64(g))

  /** Winnowing fingerprint selection (the MOSS scheme): slide a
    * `w`-window over the document's shingle-hash sequence and keep
    * each window's MINIMUM hash. Guarantee: any shared token run of
    * length ≥ w + n − 1 between two documents shares at least one
    * selected fingerprint, while only ~2/(w+1) of all shingles are
    * kept — the partial-duplication detector that matches on selected
    * fingerprints instead of full shingle sets. Pure array expression
    * (no shuffle, no UDF); documents shorter than one window keep the
    * minimum of what they have.
    *
    * `hashes` MUST be a materialized column (its own projection —
    * e.g. `withColumn("hs", shingleHashes(...))` first), NOT an
    * inlined hash pipeline: HOF lambdas re-evaluate captured
    * expressions per element, so inlining turns O(len) hashing into
    * O(len·w) — measured 12x on q124 (46s → 3.9s at sf0.1). The same
    * finish-lambda discipline as the media parsers. */
  def winnowFromHashes(hashes: Column, w: Int): Column = {
    val starts = sequence(lit(1), greatest(size(hashes) - (w - 1), lit(1)))
    when(size(hashes) === 0, array().cast("array<long>"))
      .otherwise(array_distinct(
        transform(starts, i => array_min(slice(hashes, i, lit(w))))))
  }

  /** Character-class distribution entropy per group: Shannon entropy
    * (bits) over the {lower, upper, digit, whitespace, other}
    * character classes — the gibberish / binary-noise detector
    * (natural prose sits near ~1.3–1.8 bits over these classes;
    * base64 blobs and key dumps push toward uniform).
    *
    * Determinism: the five class counts are exact BIGINTs from ONE
    * map-side-combined aggregate; the entropy folds the five terms in
    * a FIXED literal order, so the only float ops are five log2 calls
    * and four adds in pinned sequence — 6dp-rounded, it replays in any
    * engine (the [[graft.analytics.Drift.chi2Independence]] discipline
    * with a compile-time term order instead of a sorted fold). */
  /** Phrase-blocklist census: per (group, phrase), how many documents
    * contain the phrase as a substring, plus how many documents in the
    * group match ANY phrase — the NSFW/compliance filtering stage of a
    * curation pipeline, in audit form (the removal itself is
    * `filter(!hitsAny)` over the same expression).
    *
    * 100 TB shape: the blocklist is a broadcast array LITERAL folded
    * into the scan (`filter` + `contains` HOF, codegen'd — no join, no
    * UDF); only (group, phrase) hit pairs leave the scan, and both
    * aggregates combine map-side. For blocklists beyond a few thousand
    * entries switch to the token-join form (shared with the
    * decontaminators) — substring semantics then need phrase-length
    * windows, i.e. [[graft.text.SpanDedup]]'s keys. */
  def blocklistCensus(df: DataFrame, group: Column, text: Column,
                      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty)
    val parr = array(phrases.map(lit): _*)
    val hits = df.select(group.as("g"),
      filter(parr, p => text.contains(p)).as("hits"))
    val any = hits.groupBy("g")
      .agg(count(when(size(col("hits")) > 0, lit(1))).as("n_docs_flagged"))
    val per = hits.select(col("g"), explode(col("hits")).as("phrase"))
      .groupBy("g", "phrase").agg(count(lit(1)).as("n_docs_hit"))
    per.join(any, "g")
      .select(col("g"), col("phrase"), col("n_docs_hit"),
        col("n_docs_flagged"))
  }

  def charClassEntropy(df: DataFrame, group: Column, text: Column): DataFrame = {
    def cnt(pattern: String): Column =
      sum(length(regexp_replace(text, pattern, ""))).cast("long")
    val counted = df.groupBy(group.as("grp"))
      .agg(cnt("[^a-z]").as("n_lower"), cnt("[^A-Z]").as("n_upper"),
        cnt("[^0-9]").as("n_digit"), cnt("[^ \\t\\n]").as("n_space"),
        cnt("[a-zA-Z0-9 \\t\\n]").as("n_other"))
      .withColumn("n_chars",
        col("n_lower") + col("n_upper") + col("n_digit") +
          col("n_space") + col("n_other"))
    def term(c: Column): Column = {
      val p = c.cast("double") / col("n_chars").cast("double")
      when(c > 0, -p * log2(p)).otherwise(lit(0.0))
    }
    counted.select(col("grp"), col("n_chars"),
      round(term(col("n_lower")) + term(col("n_upper")) +
        term(col("n_digit")) + term(col("n_space")) +
        term(col("n_other")), 6).as("h_bits"))
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-governance operators: PII redaction and per-source
  * token-budget mixture selection — the two pipeline stages between
  * "cleaned corpus" and "training mix". Both are hash-checked: regex
  * semantics agree between Spark's Java regex and DuckDB's RE2 for the
  * conservative patterns used (character classes, bounded repeats,
  * word boundaries — no backrefs or lookaround), and the md5
  * fingerprint of the redacted text pins the FULL transform output,
  * not just the counts.
  *
  * 100 TB shape: redaction is a pure per-row projection fused into the
  * scan. Mixture selection is one running sum per source partition
  * (a partitioned window, never a single-partition global window); a
  * deployment with few giant sources swaps in the range-bucketed
  * distributed prefix sum that [[graft.text.Packing]] already uses.
  */
object Governance {

  type Q = (SparkSession, String) => DataFrame

  /** Conservative, RE2-compatible patterns (shared with the oracle so
    * the two engines cannot drift). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{4}\\b"

  /** Deterministic PII injection: the synthetic corpus contains no
    * addresses, so each doc gets one email + one phone derived from its
    * id — the redactor then has real work whose output both engines
    * replay byte-for-byte. */
  private val withPii = concat(col("text"),
    lit(" contact user"), col("doc_id").cast("string"),
    lit("@example.com or 555-"),
    lpad((col("doc_id") % 10000).cast("string"), 4, "0"))

  // ---------------------------------------------------------------- q98
  // PII redaction census: per-doc match counts + md5 fingerprint of the
  // fully redacted text (emails then phones, placeholders in place).
  val q98_pii_redact: Q = (s, dir) =>
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(withPii, lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(withPii, lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(withPii, EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).as("redacted_fp"))
      .orderBy("doc_id")

  val q98_sql: String =
    s"""WITH p AS (SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR)
       |         || '@example.com or 555-'
       |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  md5(regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
       |      '$PhoneRe', '<PHONE>', 'g')) AS redacted_fp
       |FROM p ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q99
  // Mixture selection under a per-source token budget: docs enter in a
  // deterministic md5 order and each source keeps its greedy prefix
  // whose running token total stays under the budget — the "tokens per
  // domain" knob of corpus mixing, hash-checked per selected row.
  // 600 binds at every test SF (per-source mass is ≥1.1k tokens at
  // sf0.001), so the cutoff branch is genuinely exercised by the gate.
  val MixTokenBudget = 600L

  val q99_mixture_budget: Q = (s, dir) => {
    val d = Tables.load(s, dir, "documents").select(
      col("doc_id"), col("source"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
      conv(substring(md5(concat(col("doc_id").cast("string"), lit("|mix42"))), 1, 8),
        16, 10).cast("long").as("ord"))
    val w = Window.partitionBy("source").orderBy("ord", "doc_id")
    d.withColumn("cum", sum("n_tokens").over(w))
      .filter(col("cum") - col("n_tokens") < MixTokenBudget)
      .select("doc_id", "source", "n_tokens")
      .orderBy("doc_id")
  }

  val q99_sql: String =
    s"""WITH d AS (SELECT doc_id, source,
       |    len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|mix42'), 1, 8)
       |         AS BIGINT) AS ord
       |  FROM documents),
       |c AS (SELECT doc_id, source, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY source ORDER BY ord, doc_id) AS cum
       |  FROM d)
       |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens
       |FROM c WHERE cum - n_tokens < $MixTokenBudget
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q101
  // Benchmark decontamination: a synthetic "eval set" (a 7-token slice
  // of every 41st document) is scanned for word 5-gram overlap against
  // the whole corpus; output is the per-doc hit census. The source docs
  // themselves hit by construction; near-duplicate docs in the corpus
  // hit too — exactly the leakage the pre-training check exists to find.
  val BenchN = 5

  val q101_decontam: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val t = split(lower(trim(col("text"))), "\\s+")
    val bench = docs
      .filter(col("doc_id") % 41 === 0 && size(t) >= BenchN + 4)
      .select(array_join(slice(t, 3, BenchN + 2), " ").as("text"))
    graft.text.Decontam.contaminationReport(docs, bench, BenchN)
      .orderBy("doc_id")
  }

  val q101_sql: String = {
    val n = BenchN
    def gh(arr: String, i: String) =
      s"CAST('0x' || substr(md5(array_to_string(list_slice($arr, $i, $i + ${n - 1}), ' ')), 1, 15) AS BIGINT)"
    s"""WITH toks AS (SELECT doc_id,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM documents),
       |b AS (SELECT list_slice(t, 3, ${n + 4}) AS bt FROM toks
       |      WHERE doc_id % 41 = 0 AND len(t) >= ${n + 4}),
       |bg AS (SELECT DISTINCT gram_h FROM (
       |    SELECT UNNEST(list_transform(generate_series(1, len(bt) - ${n - 1}),
       |        i -> ${gh("bt", "i")})) AS gram_h FROM b)),
       |dg AS (SELECT doc_id, UNNEST(list_transform(generate_series(1, len(t) - ${n - 1}),
       |        i -> ${gh("t", "i")})) AS gram_h FROM toks WHERE len(t) >= $n)
       |SELECT doc_id, CAST(count(DISTINCT gram_h) AS BIGINT) AS n_hit_grams
       |FROM dg JOIN bg USING (gram_h)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q187
  // k-anonymity census over quasi-identifiers (segment, nation,
  // $1000-acctbal band): the histogram of equivalence-class sizes that
  // decides whether a slice can leave the privacy boundary — min(k)
  // IS the release's anonymity level, and the k<5 mass is the
  // suppression worklist. Two map-side-combined aggregates; the
  // histogram is bounded by distinct class sizes, tiny at any scale.
  val q187_k_anonymity: Q = (s, dir) =>
    graft.analytics.Privacy.kAnonymityHistogram(
      Tables.load(s, dir, "customer"),
      Seq(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket")))
      .orderBy("k")

  val q187_sql: String =
    """WITH cls AS (SELECT c_mktsegment, c_nationkey,
      |        CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
      |        count(*) AS k
      |      FROM customer GROUP BY 1, 2, 3)
      |SELECT k, count(*) AS n_classes, k * count(*) AS n_rows
      |FROM cls GROUP BY k ORDER BY k""".stripMargin

  // --------------------------------------------------------------- q193
  // Phrase-blocklist audit: per (source, phrase) document hit counts
  // plus the any-phrase flagged mass — the compliance/NSFW filtering
  // stage in audit form. The blocklist folds into the scan as a
  // broadcast array literal (filter+contains HOF, no join, no UDF);
  // only hit pairs leave the scan.
  val Blocklist = Seq("slow fast", "hash value", "merge batch")

  val q193_blocklist: Q = (s, dir) =>
    graft.text.TextAnalysis.blocklistCensus(
      Tables.load(s, dir, "documents"), col("source"), col("text"), Blocklist)
      .orderBy("g", "phrase")

  val q193_sql: String = {
    val bl = Blocklist.map(p => s"'$p'").mkString(", ")
    s"""WITH h AS (SELECT source AS g,
       |    list_filter([$bl], p -> contains(text, p)) AS hits
       |  FROM documents),
       |a AS (SELECT g, CAST(count(CASE WHEN len(hits) > 0 THEN 1 END) AS BIGINT)
       |        AS n_docs_flagged
       |      FROM h GROUP BY 1),
       |p AS (SELECT g, UNNEST(hits) AS phrase FROM h),
       |c AS (SELECT g, phrase, CAST(count(*) AS BIGINT) AS n_docs_hit
       |      FROM p GROUP BY 1, 2)
       |SELECT c.g, c.phrase, c.n_docs_hit, a.n_docs_flagged
       |FROM c JOIN a USING (g) ORDER BY g, phrase""".stripMargin
  }

  // --------------------------------------------------------------- q198
  // Unicode-normalization census: the canonicalization audit a
  // multilingual corpus runs before ANY hash-keyed dedup — composed
  // "é" and decomposed "e"+U+0301 are byte-different, hash-different,
  // render-identical strings, so un-normalized text leaks duplicates
  // straight through fingerprint dedup. The synthetic corpus is pure
  // ASCII, so each doc gets a deterministic id-keyed suffix in one of
  // four states (three decomposed accent sequences + one already-NFC
  // control group); the census counts, per (source, variant), how many
  // docs NFC actually rewrites and how many characters it saves.
  // The normalizer itself is a native codegen'd expression
  // (graft.expressions.UnicodeNormalize) with an isNormalized
  // zero-allocation fast path — no UDF, fused into the scan.
  private val nfcSuffix =
    when(col("doc_id") % 4 === 0, lit(" cafe\u0301 menu"))
      .when(col("doc_id") % 4 === 1, lit(" u\u0308ber alles"))
      .when(col("doc_id") % 4 === 2, lit(" plain ascii"))
      .otherwise(lit(" man\u0303ana plans"))

  val q198_nfc_census: Q = (s, dir) => {
    val dirty = concat(col("text"), nfcSuffix)
    Tables.load(s, dir, "documents")
      .select(col("source"), (col("doc_id") % 4).as("variant"),
        dirty.as("d"),
        graft.expressions.UnicodeNormalize.nfc(dirty).as("n"))
      .groupBy("source", "variant")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("d") =!= col("n"), 1L).otherwise(0L)).as("n_changed"),
        sum(length(col("d"))).as("chars_before"),
        sum(length(col("n"))).as("chars_after"))
      .orderBy("source", "variant")
  }

  val q198_sql: String =
    """WITH d AS (SELECT source, doc_id % 4 AS variant,
      |    text || CASE doc_id % 4
      |      WHEN 0 THEN ' cafe' || chr(769) || ' menu'
      |      WHEN 1 THEN ' u' || chr(776) || 'ber alles'
      |      WHEN 2 THEN ' plain ascii'
      |      ELSE ' man' || chr(771) || 'ana plans' END AS dirty
      |  FROM documents),
      |n AS (SELECT source, variant, dirty, nfc_normalize(dirty) AS norm
      |      FROM d)
      |SELECT source, variant, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN dirty <> norm THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_changed,
      |  CAST(sum(length(dirty)) AS BIGINT) AS chars_before,
      |  CAST(sum(length(norm)) AS BIGINT) AS chars_after
      |FROM n GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Map[String, Q] = Map(
    "q198_nfc_census" -> q198_nfc_census,
    "q193_blocklist" -> q193_blocklist,
    "q98_pii_redact" -> q98_pii_redact,
    "q99_mixture_budget" -> q99_mixture_budget,
    "q101_decontam" -> q101_decontam,
    "q187_k_anonymity" -> q187_k_anonymity)

  val oracle: Map[String, String] = Map(
    "q198_nfc_census" -> q198_sql,
    "q193_blocklist" -> q193_sql,
    "q98_pii_redact" -> q98_sql,
    "q99_mixture_budget" -> q99_sql,
    "q101_decontam" -> q101_sql,
    "q187_k_anonymity" -> q187_sql)
}

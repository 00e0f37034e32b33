package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-5 corpus-curation additions: corpus-wide line dedup, scalar-
  * quantized ANN, KS distribution drift, and the Heaps-law vocabulary
  * growth curve. Every query is fully hash-checked against the DuckDB
  * oracle — the SQ-ANN pipeline stays in integer micro-units end to
  * end, so even the two-stage ADC + exact re-rank replays bit-for-bit.
  */
object Curation {

  type Q = (SparkSession, String) => DataFrame

  /** Tokens per synthetic "line" (the corpus has no newlines; a real
    * deployment chunks on `\n` instead — same operator). */
  val LineTokens = 10

  // --------------------------------------------------------------- q106
  // RefinedWeb-style corpus-wide exact line dedup: every repeated
  // 10-token line keeps only its first (doc_id, position) occurrence;
  // output is the per-doc census + md5 of the reassembled text.
  val q106_line_dedup: Q = (s, dir) =>
    graft.text.LineDedup
      .dedupCensus(Tables.load(s, dir, "documents"),
        col("doc_id"), col("text"), LineTokens)
      .orderBy("doc_id")

  val q106_sql: String =
    s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       |              FROM documents),
       |ln AS (SELECT doc_id, t,
       |         UNNEST(generate_series(1,
       |           CAST(greatest(ceil(len(t) / $LineTokens.0), 1) AS BIGINT))) AS i
       |       FROM toks),
       |lines AS (SELECT doc_id, i - 1 AS line_idx,
       |            array_to_string(list_slice(t, (i - 1) * $LineTokens + 1,
       |              (i - 1) * $LineTokens + $LineTokens), ' ') AS line
       |          FROM ln),
       |k AS (SELECT doc_id, line_idx, line,
       |        row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) = 1
       |          AS keep
       |      FROM lines)
       |SELECT doc_id, count(*) AS n_lines,
       |  count(CASE WHEN keep THEN 1 END) AS n_kept,
       |  md5(coalesce(string_agg(CASE WHEN keep THEN line END, ' '
       |        ORDER BY line_idx), '')) AS kept_fp
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q107
  // Scalar-quantized ANN (FAISS SQ-family): 16 uniform bins per
  // dimension in integer micro-units, ADC scan over the codes, exact
  // re-rank of the 3k shortlist. Codebook fit, encoding, both distance
  // passes and the final ranking are BIGINT-exact — the oracle replays
  // the whole two-stage pipeline bit-for-bit.
  val SqBins = 16
  val SqK = 3
  val SqRerank = 9
  val SqDim = 64

  val q107_sq_ann: Q = (s, dir) => {
    val e = Tables.load(s, dir, "embeddings")
    val codebook = graft.similarity.Sq.fit(e, SqBins)
    val encoded = graft.similarity.Sq.encode(e, codebook, SqBins)
    graft.similarity.Sq
      .adcTopK(encoded, codebook, e, e.filter(col("vec_id") < 20),
        k = SqK, rerank = SqRerank, dim = SqDim, bins = SqBins)
      .orderBy("query_id", "rank")
  }

  val q107_sql: String =
    s"""WITH m AS (SELECT vec_id, list_transform(embedding,
       |             x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS mv
       |           FROM embeddings),
       |p AS (SELECT vec_id, UNNEST(generate_series(1, $SqDim)) AS pos, mv FROM m),
       |flat AS (SELECT vec_id, pos, mv[pos] AS v FROM p),
       |r AS (SELECT pos, min(v) AS mn, max(v) AS mx, max(v) - min(v) + 1 AS w
       |      FROM flat GROUP BY pos),
       |cd AS (SELECT f.vec_id, f.pos, ((f.v - r.mn) * $SqBins) // r.w AS code,
       |         f.v - r.mn AS rel
       |       FROM flat f JOIN r USING (pos)),
       |bkt AS (SELECT pos, code, CAST(sum(rel) // count(*) AS BIGINT) AS crel
       |        FROM cd GROUP BY pos, code),
       |grid AS (SELECT r.pos, g.code, r.mn + coalesce(b.crel, 0) AS cent
       |         FROM r CROSS JOIN
       |           (SELECT UNNEST(generate_series(0, ${SqBins - 1})) AS code) g
       |         LEFT JOIN bkt b ON b.pos = r.pos AND b.code = g.code),
       |cents AS (SELECT list(CAST(cent AS BIGINT) ORDER BY pos, code) AS cents
       |          FROM grid),
       |codes AS (SELECT vec_id, list(CAST(code AS BIGINT) ORDER BY pos) AS codes
       |          FROM cd GROUP BY vec_id),
       |adc AS (SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id, q.mv AS qmv,
       |          CAST(list_sum(list_transform(generate_series(1, $SqDim), d ->
       |            (q.mv[d] - cs.cents[(d - 1) * $SqBins + x.codes[d] + 1])
       |            * (q.mv[d] - cs.cents[(d - 1) * $SqBins + x.codes[d] + 1])))
       |            AS BIGINT) AS adist
       |        FROM m q, codes x, cents cs
       |        WHERE q.vec_id < 20 AND x.vec_id <> q.vec_id),
       |sl AS (SELECT query_id, neighbor_id, qmv, adist,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY adist, neighbor_id) AS arank
       |       FROM adc),
       |ex AS (SELECT s.query_id, s.neighbor_id, s.adist,
       |         CAST(list_sum(list_transform(generate_series(1, $SqDim), d ->
       |           (s.qmv[d] - c.mv[d]) * (s.qmv[d] - c.mv[d]))) AS BIGINT) AS edist
       |       FROM sl s JOIN m c ON c.vec_id = s.neighbor_id
       |       WHERE s.arank <= $SqRerank),
       |fin AS (SELECT query_id, neighbor_id, adist, edist,
       |          row_number() OVER (PARTITION BY query_id
       |            ORDER BY edist, neighbor_id) AS rank
       |        FROM ex)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adist, edist
       |FROM fin WHERE rank <= $SqK ORDER BY query_id, rank""".stripMargin

  // --------------------------------------------------------------- q108
  // Distribution drift: exact two-sample KS statistic on document
  // length between every pair of sources. ks_num is the exact BIGINT
  // KS numerator max|cum_a·n_b − cum_b·n_a|; ks = ks_num/(n_a·n_b).
  val q108_ks_drift: Q = (s, dir) =>
    graft.analytics.Drift
      .ksPairs(Tables.load(s, dir, "documents"), col("source"), col("n_chars"))
      .orderBy("grp_a", "grp_b")

  val q108_sql: String =
    """WITH cnt AS (SELECT source AS grp, n_chars AS value, count(*) AS c
      |             FROM documents GROUP BY 1, 2),
      |pairs AS (SELECT a.grp AS grp_a, b.grp AS grp_b
      |          FROM (SELECT DISTINCT grp FROM cnt) a,
      |               (SELECT DISTINCT grp FROM cnt) b
      |          WHERE a.grp < b.grp),
      |merged AS (SELECT p.grp_a, p.grp_b, c.value,
      |    sum(CASE WHEN c.grp = p.grp_a THEN c.c ELSE 0 END) AS ca,
      |    sum(CASE WHEN c.grp = p.grp_b THEN c.c ELSE 0 END) AS cb
      |  FROM pairs p JOIN cnt c ON c.grp = p.grp_a OR c.grp = p.grp_b
      |  GROUP BY 1, 2, 3),
      |e AS (SELECT grp_a, grp_b, value,
      |        sum(ca) OVER (PARTITION BY grp_a, grp_b ORDER BY value) AS cum_a,
      |        sum(cb) OVER (PARTITION BY grp_a, grp_b ORDER BY value) AS cum_b,
      |        sum(ca) OVER (PARTITION BY grp_a, grp_b) AS n_a,
      |        sum(cb) OVER (PARTITION BY grp_a, grp_b) AS n_b
      |      FROM merged)
      |SELECT grp_a, grp_b, CAST(max(n_a) AS BIGINT) AS n_a,
      |  CAST(max(n_b) AS BIGINT) AS n_b,
      |  CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS ks_num,
      |  round(CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS DOUBLE)
      |        / (max(n_a) * max(n_b)), 6) AS ks
      |FROM e GROUP BY grp_a, grp_b ORDER BY grp_a, grp_b""".stripMargin

  // --------------------------------------------------------------- q109
  // Heaps-law vocabulary growth over word BIGRAMS (the unigram vocab of
  // the synthetic corpus saturates within four documents): per
  // first-occurrence doc, the new types introduced and the cumulative
  // vocabulary size (via the distributed range-bucketed prefix sum —
  // no global window).
  val q109_vocab_growth: Q = (s, dir) => {
    import graft.text.TextAnalysis
    graft.text.Corpus
      .vocabGrowth(Tables.load(s, dir, "documents"), col("doc_id"),
        TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 2))
      .orderBy("first_doc")
  }

  val q109_sql: String =
    """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |           FROM documents),
      |toks AS (SELECT doc_id, UNNEST(list_transform(
      |    generate_series(1, greatest(len(t) - 1, 0)),
      |    i -> t[i] || ' ' || t[i + 1])) AS token
      |  FROM w),
      |fd AS (SELECT token, min(doc_id) AS first_doc FROM toks GROUP BY token),
      |nt AS (SELECT first_doc, count(*) AS new_types FROM fd GROUP BY first_doc)
      |SELECT first_doc, CAST(new_types AS BIGINT) AS new_types,
      |  CAST(sum(new_types) OVER (ORDER BY first_doc) AS BIGINT) AS vocab_size
      |FROM nt ORDER BY first_doc""".stripMargin

  // --------------------------------------------------------------- q110
  // SCD type-2 dimension build from the event log: per user, collapse
  // consecutive runs of the same event_type, emit [valid_from,
  // valid_to) validity intervals; the open interval is current.
  val q110_scd2: Q = (s, dir) =>
    graft.operators.Scd
      .scd2(Tables.load(s, dir, "events"),
        col("user_id"), col("event_type"), col("ts"),
        Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("event_type"),
        date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("valid_from"),
        date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("valid_to"),
        col("is_current"))
      .orderBy("user_id", "valid_from")

  val q110_sql: String =
    """WITH m AS (SELECT user_id, event_type, ts,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |c AS (SELECT user_id, event_type, ts FROM m
      |      WHERE prev IS NULL OR prev <> event_type),
      |i AS (SELECT user_id, event_type, ts AS vf,
      |        lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS vt
      |      FROM c)
      |SELECT user_id, event_type,
      |  strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
      |  strftime(vt, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
      |  vt IS NULL AS is_current
      |FROM i ORDER BY user_id, valid_from""".stripMargin

  val all: Map[String, Q] = Map(
    "q106_line_dedup" -> q106_line_dedup,
    "q107_sq_ann" -> q107_sq_ann,
    "q108_ks_drift" -> q108_ks_drift,
    "q109_vocab_growth" -> q109_vocab_growth,
    "q110_scd2" -> q110_scd2)

  val oracle: Map[String, String] = Map(
    "q106_line_dedup" -> q106_sql,
    "q107_sq_ann" -> q107_sql,
    "q108_ks_drift" -> q108_sql,
    "q109_vocab_growth" -> q109_sql,
    "q110_scd2" -> q110_sql)
}

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

  /** Shared DuckDB CTE chain: documents → fixed-width token lines
    * (doc_id, line_idx, line) — q106 dedups them, q111 builds the
    * duplicate-cluster graph from them. */
  private[queries] def linesCtes: String =
    s"""toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       |              FROM documents),
       |ln AS (SELECT doc_id, t,
       |         UNNEST(generate_series(1,
       |           CAST(greatest(ceil(len(t) / $LineTokens.0), 1) AS BIGINT))) AS i
       |       FROM toks),
       |lines AS (SELECT doc_id, i - 1 AS line_idx,
       |            array_to_string(list_slice(t, (i - 1) * $LineTokens + 1,
       |              (i - 1) * $LineTokens + $LineTokens), ' ') AS line
       |          FROM ln)""".stripMargin

  val q106_sql: String =
    s"""WITH $linesCtes,
       |k AS (SELECT doc_id, line_idx, line,
       |        row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) = 1
       |          AS keep
       |      FROM lines)
       |SELECT doc_id, count(*) AS n_lines,
       |  count(CASE WHEN keep THEN 1 END) AS n_kept,
       |  md5(coalesce(string_agg(CASE WHEN keep THEN line END, ' '
       |        ORDER BY line_idx), '')) AS kept_fp
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q184
  // Within-SOURCE boilerplate removal (the CCNet/RefinedWeb rule q106
  // deliberately is not): a line repeating across >= 2 distinct docs
  // of the SAME source is template/navigation text and every
  // occurrence goes — first included — while cross-source repeats
  // survive. kept_fp pins the rewritten text itself.
  val BoilerMinDocs = 2

  val q184_boilerplate: Q = (s, dir) =>
    graft.text.LineDedup
      .boilerplateCensus(Tables.load(s, dir, "documents"),
        col("doc_id"), col("source"), col("text"), LineTokens, BoilerMinDocs)
      .orderBy("doc_id")

  /** linesCtes with the source column carried through. */
  private[queries] def linesBySourceCtes: String =
    s"""toks AS (SELECT doc_id, source,
       |           regexp_split_to_array(trim(text), '\\s+') AS t
       |         FROM documents),
       |ln AS (SELECT doc_id, source, t,
       |         UNNEST(generate_series(1,
       |           CAST(greatest(ceil(len(t) / $LineTokens.0), 1) AS BIGINT))) AS i
       |       FROM toks),
       |lines AS (SELECT doc_id, source, i - 1 AS line_idx,
       |            array_to_string(list_slice(t, (i - 1) * $LineTokens + 1,
       |              (i - 1) * $LineTokens + $LineTokens), ' ') AS line
       |          FROM ln)""".stripMargin

  val q184_sql: String =
    s"""WITH $linesBySourceCtes,
       |b AS (SELECT source, line FROM lines
       |      GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= $BoilerMinDocs),
       |k AS (SELECT l.doc_id, l.line_idx, l.line, b.line IS NULL AS keep
       |      FROM lines l LEFT JOIN b
       |        ON b.source = l.source AND b.line = l.line)
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

  /** DuckDB replay of the SQ codebook fit + full-corpus encoding:
    * expects a CTE `m(vec_id, mv)`, ends at `cents` (flattened grid)
    * and `codes` (per-vector codes). Shared by q107 and the q208
    * tier report. */
  private[queries] val sqCodebookCtes: String =
    s"""p AS (SELECT vec_id, UNNEST(generate_series(1, $SqDim)) AS pos, mv FROM m),
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
       |          FROM cd GROUP BY vec_id)""".stripMargin

  val q107_sql: String =
    s"""WITH m AS (SELECT vec_id, list_transform(embedding,
       |             x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS mv
       |           FROM embeddings),
       |""".stripMargin + sqCodebookCtes + ",\n" +
      s"""adc AS (SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id, q.mv AS qmv,
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
    """WITH m AS (SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |c AS (SELECT user_id, event_type, ts, event_id FROM m
      |      WHERE prev IS NULL OR prev <> event_type),
      |i AS (SELECT user_id, event_type, ts AS vf,
      |        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
      |      FROM c)
      |SELECT user_id, event_type,
      |  strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
      |  strftime(vt, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
      |  vt IS NULL AS is_current
      |FROM i ORDER BY user_id, valid_from""".stripMargin

  // --------------------------------------------------------------- q111
  // PageRank over the duplicate-cluster graph (docs joined by shared
  // lines, hot-line cap at 20 docs): 3 exact integer-micro-unit
  // rounds — the oracle unrolls the identical iterations. Finds the
  // "hub" documents a dedup pass should canonicalize first.
  val PrMinDocs = 2
  val PrMaxDocs = 20
  val PrIters = 3
  val PrMass = 1000000000000L

  val q111_pagerank: Q = (s, dir) => {
    val lines = graft.text.LineDedup.chunkLines(
      Tables.load(s, dir, "documents"), col("doc_id"), col("text"), LineTokens)
    val edges = graft.text.LineDedup.shareEdges(lines, PrMinDocs, PrMaxDocs)
    graft.graph.PageRank.run(edges, iters = PrIters, totalMass = PrMass)
      .select(col("node").as("doc_id"), col("r").as("rank_micro"))
      .orderBy("doc_id")
  }

  /** Shared DuckDB CTE chain ending in the duplicate-cluster `edges`
    * relation (symmetric directed, line-share, occupancy-capped) —
    * q111 runs PageRank over it, q117 (Mining) counts triangles. */
  private[queries] def shareEdgesCtes: String =
    s"""$linesCtes,
       |eligible AS (SELECT line FROM lines
       |             GROUP BY line
       |             HAVING count(DISTINCT doc_id) BETWEEN $PrMinDocs AND $PrMaxDocs),
       |dl AS (SELECT DISTINCT l.line, l.doc_id
       |       FROM lines l JOIN eligible USING (line)),
       |edges AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       |          FROM dl a JOIN dl b USING (line)
       |          WHERE a.doc_id <> b.doc_id)""".stripMargin

  val q111_sql: String = {
    def iter(k: Int, prev: String) =
      s"""i$k AS (SELECT p.node,
         |    (15 * ($PrMass // p.n)) // 100
         |      + (85 * coalesce(s.inc, 0)) // 100 AS r, p.n
         |  FROM $prev p LEFT JOIN (
         |    SELECT e.dst, sum(r.r // d.deg) AS inc
         |    FROM edges e JOIN $prev r ON r.node = e.src
         |                 JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) s ON s.dst = p.node)""".stripMargin
    val rounds = (1 to PrIters).map(k => iter(k, s"i${k - 1}")).mkString(",\n")
    s"""WITH $shareEdgesCtes,
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |i0 AS (SELECT node, $PrMass // n AS r, n FROM nodes, nn),
       |$rounds
       |SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_micro
       |FROM i$PrIters ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q112
  // Quality-classifier scoring: sigmoid over the quality features with
  // pinned model weights (a trained Logit.Model ships as constants —
  // Ols's F10 discipline extended to classification). The features are
  // 6dp-rounded on both sides, the linear part folds left-to-right in
  // both engines, so the score hash-matches at 6dp.
  val QwIntercept = -2.0
  val QwNTokens = 0.02
  val QwAvgLen = 0.3
  val QwStopword = 8.0
  val QwPunct = -20.0

  val q112_quality_score: Q = (s, dir) => {
    val model = graft.ml.Logit.Model(
      Seq("n_tokens", "avg_token_len", "stopword_ratio", "punct_ratio"),
      Array(QwNTokens, QwAvgLen, QwStopword, QwPunct), QwIntercept)
    graft.text.TextAnalysis
      .qualityFeatures(Tables.load(s, dir, "documents"), col("text"))
      .select(col("doc_id"), round(model.scoreExpr, 6).as("qscore"),
        (model.scoreExpr >= 0.5).as("pred_keep"))
      .orderBy("doc_id")
  }

  val q112_sql: String = {
    val stop = graft.text.TextAnalysis.defaultStopwords
      .map(w => s"'$w'").mkString(", ")
    val z = s"(((($QwIntercept + n_tokens * $QwNTokens) + avg_token_len * $QwAvgLen)" +
      s" + stopword_ratio * $QwStopword) + punct_ratio * $QwPunct)"
    s"""WITH f AS (SELECT doc_id,
       |    len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       |    round(CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'),
       |            t -> length(t))) AS DOUBLE)
       |          / len(regexp_split_to_array(trim(text), '\\s+')), 6) AS avg_token_len,
       |    round(CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |            t -> lower(t) IN ($stop))) AS DOUBLE)
       |          / len(regexp_split_to_array(trim(text), '\\s+')), 6) AS stopword_ratio,
       |    round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
       |          / length(text), 6) AS punct_ratio
       |  FROM documents)
       |SELECT doc_id, round(1.0 / (1.0 + exp(-$z)), 6) AS qscore,
       |  1.0 / (1.0 + exp(-$z)) >= 0.5 AS pred_keep
       |FROM f ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q113
  // Z-order (Morton) clustering key: interleave 10 bits of two join
  // dimensions of lineitem; the census per z-cell (z determines the
  // cell bijectively, so ORDER BY z is total) hash-checks the exact
  // curve arithmetic both engines compute with plain integer ops.
  val ZBits = 10

  val q113_zorder: Q = (s, dir) => {
    val z = graft.storage.ZOrder.zValue(
      pmod(col("l_orderkey"), lit(1024L)), pmod(col("l_partkey"), lit(1024L)),
      ZBits)
    Tables.load(s, dir, "lineitem")
      .select(pmod(col("l_orderkey"), lit(1024L)).as("x"),
        pmod(col("l_partkey"), lit(1024L)).as("y"), z.as("zv"))
      .groupBy("x", "y", "zv").agg(count(lit(1)).as("n"))
      .orderBy("zv")
      .limit(100)
  }

  val q113_sql: String = {
    val z = graft.storage.ZOrder.zValueSql("(l_orderkey % 1024)",
      "(l_partkey % 1024)", ZBits)
    s"""SELECT l_orderkey % 1024 AS x, l_partkey % 1024 AS y,
       |  $z AS zv, count(*) AS n
       |FROM lineitem GROUP BY 1, 2, 3 ORDER BY zv LIMIT 100""".stripMargin
  }

  // --------------------------------------------------------------- q115
  // Chi-square independence: is language distribution independent of
  // source? Exact-integer cell numerators; the double cell terms sum
  // in a pinned (lang, source) fold order, so the statistic is
  // bit-stable across engines.
  val q115_chi2: Q = (s, dir) =>
    graft.analytics.Drift.chi2Independence(
      Tables.load(s, dir, "documents"), col("lang"), col("source"))

  val q115_sql: String =
    """WITH obs AS (SELECT lang AS a, source AS b, count(*) AS o
      |             FROM documents GROUP BY 1, 2),
      |rt AS (SELECT a, sum(o) AS r FROM obs GROUP BY a),
      |ct AS (SELECT b, sum(o) AS c FROM obs GROUP BY b),
      |tot AS (SELECT sum(o) AS n FROM obs),
      |grid AS (SELECT rt.a, ct.b, tot.n, rt.r, ct.c,
      |           coalesce(obs.o, 0) AS o
      |         FROM rt CROSS JOIN ct CROSS JOIN tot
      |         LEFT JOIN obs ON obs.a = rt.a AND obs.b = ct.b),
      |terms AS (SELECT a, b, n,
      |    (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
      |       - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
      |    * (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
      |       - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE)) AS term
      |  FROM grid)
      |SELECT CAST(max(n) AS BIGINT) AS n,
      |  CAST(count(DISTINCT a) * count(DISTINCT b) AS BIGINT) AS n_cells,
      |  CAST((count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS BIGINT) AS dof,
      |  round(list_sum(list(term ORDER BY a, b)), 6) AS chi2
      |FROM terms""".stripMargin

  // --------------------------------------------------------------- q116
  // Incremental aggregate maintenance: per-event-type moment states
  // built from the historical half (event_id < cutoff) and the delta
  // half separately, merged by component addition — provably identical
  // to a full recompute (the spec pins that); mean/variance derive at
  // read time. All state is exact BIGINT milli-units (the value
  // column carries 2 decimals; milli keeps Sum(x^2) far inside BIGINT).
  val IncCutoff = 5000L
  val IncScale = 1000L

  val q116_incremental_stats: Q = (s, dir) => {
    import graft.analytics.Drift
    val e = Tables.load(s, dir, "events")
    val hist = Drift.momentState(
      e.filter(col("event_id") < IncCutoff), col("event_type"), col("value"),
      IncScale)
    val delta = Drift.momentState(
      e.filter(col("event_id") >= IncCutoff), col("event_type"), col("value"),
      IncScale)
    Drift.momentStats(Drift.mergeMomentStates(hist, delta), IncScale)
      .withColumnRenamed("key", "event_type")
      .orderBy("event_type")
  }

  val q116_sql: String =
    s"""WITH mv AS (SELECT event_type,
       |    CAST(round(CAST(value AS DOUBLE) * $IncScale.0) AS BIGINT) AS mv,
       |    event_id
       |  FROM events),
       |hist AS (SELECT event_type, count(*) AS n, sum(mv) AS sx,
       |           sum(mv * mv) AS sxx
       |         FROM mv WHERE event_id < $IncCutoff GROUP BY event_type),
       |delta AS (SELECT event_type, count(*) AS n, sum(mv) AS sx,
       |            sum(mv * mv) AS sxx
       |          FROM mv WHERE event_id >= $IncCutoff GROUP BY event_type),
       |merged AS (SELECT event_type, sum(n) AS n, sum(sx) AS sx,
       |             sum(sxx) AS sxx
       |           FROM (SELECT * FROM hist UNION ALL SELECT * FROM delta)
       |           GROUP BY event_type)
       |SELECT event_type, CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS sx,
       |  CAST(sxx AS BIGINT) AS sxx,
       |  round(CAST(sx AS DOUBLE) / (n * $IncScale.0), 6) AS mean,
       |  CASE WHEN n > 1 THEN
       |    round((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
       |          / ((n - 1) * $IncScale.0 * $IncScale.0), 6) END AS variance
       |FROM merged ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- q148
  // Deterministic training-order shuffle + round-robin sharding: the
  // write-side step after curation. Each doc gets its position in a
  // seeded md5 permutation (52-bit key, distributed prefix-sum rank —
  // no single-partition window) and a shard in [0,8). The manifest
  // pins the FULL permutation per shard via the position-weighted
  // Σ pos·doc_id checksum, not just the balance counts.
  val ShuffleShards = 8

  val q148_shuffle_shards: Q = (s, dir) =>
    graft.operators.Sampling.shuffleShards(
      Tables.load(s, dir, "documents"), Seq("doc_id"), ShuffleShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_bytes"),
        sum(col("pos") * col("doc_id")).as("pos_dot_id"))
      .orderBy("shard")

  val q148_sql: String =
    s"""WITH p AS (SELECT doc_id, n_chars,
       |    row_number() OVER (ORDER BY
       |      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || '42'), 1, 13) AS BIGINT),
       |      doc_id) AS pos
       |  FROM documents)
       |SELECT CAST((pos - 1) % $ShuffleShards AS BIGINT) AS shard,
       |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_bytes,
       |  CAST(sum(pos * doc_id) AS BIGINT) AS pos_dot_id
       |FROM p GROUP BY 1 ORDER BY shard""".stripMargin

  // --------------------------------------------------------------- q166
  // Per-source quality-quota selection: keep the TOP 25% of each
  // source by the q112 classifier score (rank-based, not random) —
  // the curation move that raises average quality without wiping out
  // rare domains (a global score cut would drain low-scoring sources
  // entirely; the quota keeps every source represented). Score ties
  // break on doc_id, so the cut is total; the windows partition by
  // source — no global window, scales with the source count.
  val q166_quota_select: Q = (s, dir) => {
    val model = graft.ml.Logit.Model(
      Seq("n_tokens", "avg_token_len", "stopword_ratio", "punct_ratio"),
      Array(QwNTokens, QwAvgLen, QwStopword, QwPunct), QwIntercept)
    val scored = graft.text.TextAnalysis
      .qualityFeatures(Tables.load(s, dir, "documents"), col("text"))
      .select(col("doc_id"), col("source"), round(model.scoreExpr, 6).as("qscore"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("qscore").desc, col("doc_id").asc)
    val ws = org.apache.spark.sql.expressions.Window.partitionBy("source")
    scored
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(ws))
      .filter(col("__rk") <= ceil(col("__n") * 0.25))
      .select("doc_id", "source", "qscore")
      .orderBy("doc_id")
  }

  lazy val q166_sql: String = {
    val stop = graft.text.TextAnalysis.defaultStopwords
      .map(w => s"'$w'").mkString(", ")
    val z = s"(((($QwIntercept + n_tokens * $QwNTokens) + avg_token_len * $QwAvgLen)" +
      s" + stopword_ratio * $QwStopword) + punct_ratio * $QwPunct)"
    s"""WITH f AS (SELECT doc_id, source,
       |    len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       |    round(CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'),
       |            t -> length(t))) AS DOUBLE)
       |          / len(regexp_split_to_array(trim(text), '\\s+')), 6) AS avg_token_len,
       |    round(CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |            t -> lower(t) IN ($stop))) AS DOUBLE)
       |          / len(regexp_split_to_array(trim(text), '\\s+')), 6) AS stopword_ratio,
       |    round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
       |          / length(text), 6) AS punct_ratio
       |  FROM documents),
       |sc AS (SELECT doc_id, source, round(1.0 / (1.0 + exp(-$z)), 6) AS qscore FROM f),
       |r AS (SELECT doc_id, source, qscore,
       |        row_number() OVER (PARTITION BY source
       |                           ORDER BY qscore DESC, doc_id ASC) AS rk,
       |        count(*) OVER (PARTITION BY source) AS n_src
       |      FROM sc)
       |SELECT doc_id, source, qscore FROM r
       |WHERE rk <= ceil(n_src * 0.25) ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q172
  // Product-quantized ANN (FAISS IVF-PQ's compression stage, Jégou et
  // al. 2011): 8 subspaces × 8 dims, a 16-entry k-means codebook per
  // subspace (md5-seeded, 2 integer-micro-unit Lloyd rounds, integer-mean
  // updates), ADC scan via per-query 8×256 lookup tables (m lookups per
  // candidate), exact re-rank of the 3k shortlist. Codebook fit,
  // encoding, LUTs, both distance passes and the ranking are
  // BIGINT-exact — the oracle replays the trainer and the two-stage
  // search bit-for-bit. Where q107's SQ bins each dimension uniformly
  // and independently, PQ quantizes each subspace jointly — better
  // distortion at the same code budget, and the corpus scan reads
  // NOTHING but 8 small codes per row.
  val PqM = 8
  val PqKsub = 256
  val PqIters = 4
  val PqK = 3
  val PqRerank = 9
  val PqDim = 64

  val q172_pq_ann: Q = (s, dir) => {
    val e = Tables.load(s, dir, "embeddings")
    val cents = graft.similarity.Pq.trainChecked(e, PqM, PqKsub, PqIters)
    graft.similarity.Pq
      .adcTopK(e, cents, e.filter(col("vec_id") < 20), k = PqK, rerank = PqRerank)
      .orderBy("query_id", "rank")
  }

  /** Micronized-embedding CTE shared by the PQ replays. */
  private[queries] val pqMCte: String =
    """m AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS mv
      |  FROM embeddings)""".stripMargin

  /** Exact integer subdistance of `mvTbl.mv`'s subspace `subRef` to
    * centroid `cvRef` — the q172/q182 oracle primitive. */
  private[queries] def pqSdist(mvTbl: String, subRef: String, cvRef: String): String = {
    val sd = PqDim / PqM
    s"CAST(list_sum(list_transform(generate_series(1, $sd), j -> " +
      s"($mvTbl.mv[$subRef * $sd + j] - $cvRef[j]) * " +
      s"($mvTbl.mv[$subRef * $sd + j] - $cvRef[j]))) AS BIGINT)"
  }

  /** DuckDB replay of `Pq.trainChecked(m=8, ksub=16, iters=2)` plus the
    * full-corpus encoding, every CTE prefixed `p` so it composes with
    * the IVF chain (whose names it would otherwise shadow): expects a
    * CTE `m(vec_id, mv)` and ends at `pcf` (codebook) and `pwf`
    * (per-(vec, sub) codes). */
  private[queries] def pqTrainCtes: String = pqTrainCtesOn("m")

  /** [[pqTrainCtes]] with the training-input CTE name as a parameter —
    * q206 trains the very same chain over the residual table `rm`. */
  private[queries] def pqTrainCtesOn(tbl: String): String = {
    val sd = PqDim / PqM
    // argmin via one packed-key aggregate (min(d·ksub + code), the
    // exact key the native PqCodes expression uses — d ≤ 2.6·10¹⁴ so
    // the key fits BIGINT) instead of a row_number window: at ksub=256
    // the per-round candidate table is n·m·256 rows, and a GROUP BY
    // min() replay is several times cheaper than window-sorting it.
    def argmin(out: String, src: String) =
      s"""$out AS MATERIALIZED (SELECT e.vec_id, c.sub,
         |    CAST(min(${pqSdist("e", "c.sub", "c.cv")} * $PqKsub + c.code)
         |         % $PqKsub AS BIGINT) AS code
         |  FROM $tbl e CROSS JOIN $src c GROUP BY 1, 2)""".stripMargin
    def lloyd(k: Int, prev: String) =
      argmin(s"pw$k", prev) + ",\n" +
      s"""pt$k AS (SELECT w.sub, w.code, g.j,
         |          sum(e.mv[w.sub * $sd + g.j]) AS sm, count(*) AS n
         |        FROM pw$k w JOIN $tbl e USING (vec_id)
         |        CROSS JOIN (SELECT UNNEST(generate_series(1, $sd)) AS j) g
         |        GROUP BY 1, 2, 3),
         |pu$k AS (SELECT sub, code, list(CAST(sm // n AS BIGINT) ORDER BY j) AS cv
         |        FROM pt$k GROUP BY 1, 2),
         |pc$k AS MATERIALIZED (SELECT c.sub, c.code, coalesce(u.cv, c.cv) AS cv
         |        FROM $prev c LEFT JOIN pu$k u
         |          ON u.sub = c.sub AND u.code = c.code)""".stripMargin
    val rounds = (1 to PqIters).map(k => lloyd(k, s"pc${k - 1}")).mkString(",\n")
    s"""ph AS (SELECT vec_id, mv,
       |    CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) AS hh
       |  FROM $tbl),
       |pseeds AS (SELECT row_number() OVER (ORDER BY hh, vec_id) - 1 AS code, mv
       |          FROM ph QUALIFY row_number() OVER (ORDER BY hh, vec_id) <= $PqKsub),
       |psubs AS (SELECT UNNEST(generate_series(0, ${PqM - 1})) AS sub),
       |pc0 AS MATERIALIZED (SELECT s.sub, sd.code,
       |         list_transform(generate_series(1, $sd),
       |           j -> sd.mv[s.sub * $sd + j]) AS cv
       |       FROM psubs s CROSS JOIN pseeds sd),
       |$rounds,
       |pcf AS MATERIALIZED (SELECT * FROM pc$PqIters),
       |${argmin("pwf", "pcf")}""".stripMargin
  }

  /** Shortlist + exact re-rank remainder shared by q172/q182: expects
    * `adc(query_id, neighbor_id, adist)` and `m`. */
  private[queries] def pqRerankSql: String =
    s"""sl AS (SELECT query_id, neighbor_id, adist,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY adist, neighbor_id) AS arank
       |       FROM adc),
       |ex AS (SELECT s.query_id, s.neighbor_id, s.adist,
       |         CAST(list_sum(list_transform(generate_series(1, $PqDim), d ->
       |           (q.mv[d] - c.mv[d]) * (q.mv[d] - c.mv[d]))) AS BIGINT) AS edist
       |       FROM sl s JOIN m c ON c.vec_id = s.neighbor_id
       |                 JOIN m q ON q.vec_id = s.query_id
       |       WHERE s.arank <= $PqRerank),
       |fin AS (SELECT query_id, neighbor_id, adist, edist,
       |          row_number() OVER (PARTITION BY query_id
       |            ORDER BY edist, neighbor_id) AS rank
       |        FROM ex)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adist, edist
       |FROM fin WHERE rank <= $PqK ORDER BY query_id, rank""".stripMargin

  val q172_sql: String =
    "WITH " + pqMCte + ",\n" + pqTrainCtes + ",\n" +
      s"""qm AS (SELECT vec_id, mv FROM m WHERE vec_id < 20),
         |lut AS (SELECT q.vec_id AS query_id, c.sub, c.code,
         |          ${pqSdist("q", "c.sub", "c.cv")} AS ld
         |        FROM qm q CROSS JOIN pcf c),
         |adc AS (SELECT l.query_id, w.vec_id AS neighbor_id,
         |          CAST(sum(l.ld) AS BIGINT) AS adist
         |        FROM pwf w JOIN lut l ON l.sub = w.sub AND l.code = w.code
         |        WHERE w.vec_id <> l.query_id GROUP BY 1, 2),
         |""".stripMargin + pqRerankSql

  // --------------------------------------------------------------- q173
  // Bloom-prefiltered incremental line dedup (CCNet-style ingest):
  // docs md5-bucket 0 are the "new batch", the rest the existing
  // corpus; the corpus's distinct 10-token lines build ONE broadcast
  // Bloom sketch, incoming lines check it inside the scan, and only
  // bloom-positives pay the exact confirm join. No false negatives ⇒
  // the result is bit-identical to a plain semi-join, so the oracle
  // checks the decision with an ordinary join while the prefilter's
  // fpp traffic is pinned by BloomDedupSpec.
  val q173_bloom_line_dedup: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val bucket =
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10
    graft.dedup.BloomLineDedup
      .census(docs.filter(bucket === 0), docs.filter(bucket =!= 0),
        col("doc_id"), col("text"), LineTokens)
      .orderBy("doc_id")
  }

  val q173_sql: String =
    s"""WITH $linesCtes,
       |bu AS (SELECT doc_id,
       |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
       |           % 10 AS b
       |       FROM documents),
       |bl AS (SELECT l.* FROM lines l JOIN bu USING (doc_id) WHERE bu.b = 0),
       |cl AS (SELECT DISTINCT line FROM lines l JOIN bu USING (doc_id)
       |       WHERE bu.b <> 0),
       |d AS (SELECT bl.doc_id, count(*) AS n_lines,
       |        count(cl.line) AS n_dup
       |      FROM bl LEFT JOIN cl USING (line) GROUP BY 1)
       |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
       |  CAST(n_dup AS BIGINT) AS n_dup,
       |  CAST(n_lines - n_dup AS BIGINT) AS n_kept
       |FROM d ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q174
  // DSIR-style data selection (Xie et al. 2023): hashed word-bigram
  // bag-of-ngrams models on the target slice (lang = 'en') vs the raw
  // corpus; every doc scores the exact integer Σ count·llr_micro over
  // its features (the one float op — ln — is micronized per BUCKET, so
  // document scores are order-independent BIGINTs); the top 20% by
  // score are selected. The exact global rank runs through the
  // range-bucketed distributed running total — no single-partition
  // window at any count; Dsir's scaladoc documents the cheaper
  // approx-quantile threshold swap when exact rank isn't required.
  val DsirBuckets = 4096

  val q174_dsir_select: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val model = graft.text.Dsir.fit(
      docs, col("doc_id"), col("text"), col("lang") === "en", DsirBuckets)
    val sc = graft.text.Dsir.scores(
      docs, col("doc_id"), col("text"), model, DsirBuckets)
    // materialize the scored table ONCE: the running total makes three
    // passes (quantile probe, bucket totals, windows) and the count a
    // fourth — left lazy, each would replay the whole DSIR scoring
    // lineage (measured warm at sf0.1: 4.9 s lazy vs 2.2 s here)
    val named = docs.select(col("doc_id").as("id"), col("source"))
      .join(sc, "id")
      .localCheckpoint(true)
    // global rank via the range-bucketed distributed running total
    // (was the repo's one remaining single-partition window) — rank =
    // running count of 1 over the same (score desc, id) total order;
    // the corpus count broadcasts from a 1-row aggregate
    val ranked = graft.operators.Operators.withRunningTotal(
      named, lit(1L), Seq(negate(col("score_micro")), col("id")))
    val tot = named.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(tot))
      .select(col("id").as("doc_id"), col("source"), col("score_micro"),
        (col("__run") <= (col("__n") / lit(5)).cast("int")).as("selected"))
      .orderBy("doc_id")
  }

  val q174_sql: String =
    s"""WITH toks AS (SELECT doc_id, lang,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS t
       |  FROM documents),
       |bg AS (SELECT doc_id, lang, t, UNNEST(generate_series(1, len(t) - 1)) AS i
       |       FROM toks WHERE len(t) >= 2),
       |f AS (SELECT doc_id, lang,
       |        CAST('0x' || substr(md5(t[i] || ' ' || t[i + 1]), 1, 8) AS BIGINT)
       |          % $DsirBuckets AS bucket
       |      FROM bg),
       |cb AS (SELECT bucket, count(*) AS cr,
       |         count(CASE WHEN lang = 'en' THEN 1 END) AS ct
       |       FROM f GROUP BY 1),
       |tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM cb),
       |llr AS (SELECT bucket,
       |          CAST(round(1000000.0 *
       |            (ln((ct + 1.0) / (nt + $DsirBuckets.0))
       |             - ln((cr + 1.0) / (nr + $DsirBuckets.0)))) AS BIGINT) AS l
       |        FROM cb CROSS JOIN tot),
       |dc AS (SELECT doc_id, bucket, count(*) AS c FROM f GROUP BY 1, 2),
       |sc AS (SELECT d.doc_id, sum(d.c * l.l) AS score
       |       FROM dc d JOIN llr l USING (bucket) GROUP BY 1),
       |o AS (SELECT doc.doc_id, doc.source,
       |        CAST(coalesce(sc.score, 0) AS BIGINT) AS score_micro
       |      FROM documents doc LEFT JOIN sc USING (doc_id)),
       |r AS (SELECT *, row_number() OVER (ORDER BY score_micro DESC, doc_id)
       |        AS rk, count(*) OVER () AS n
       |      FROM o)
       |SELECT doc_id, source, score_micro, rk <= n // 5 AS selected
       |FROM r ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q175
  // Exact duplicated-SPAN census (Lee et al. 2022, "Deduplicating
  // Training Data Makes Language Models Better"): every maximal token
  // span of >= 8 tokens that repeats anywhere in the corpus — across
  // documents or inside one — found by the k-gram form of the
  // suffix-array pipeline (a span >= L repeats iff every L-token
  // sliding window inside it repeats). Where q106's line dedup only
  // sees fixed ALIGNED 10-token chunks, this catches the same passage
  // at any offset, the real shape of copied boilerplate. Positions and
  // lengths are exact integers; the window index moves 16-hex keys,
  // never text.
  val SpanL = 8

  val q175_span_dedup: Q = (s, dir) =>
    graft.text.SpanDedup
      .census(Tables.load(s, dir, "documents"), col("doc_id"), col("text"), SpanL)
      .orderBy("doc_id")

  val q175_sql: String =
    s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       |              FROM documents),
       |w AS (SELECT doc_id, t,
       |        UNNEST(generate_series(0, len(t) - $SpanL)) AS pos
       |      FROM toks WHERE len(t) >= $SpanL),
       |k AS (SELECT doc_id, pos,
       |        substr(md5(array_to_string(
       |          list_slice(t, pos + 1, pos + $SpanL), ' ')), 1, 16) AS key
       |      FROM w),
       |hot AS (SELECT key FROM k GROUP BY key HAVING count(*) >= 2),
       |d AS (SELECT doc_id, pos FROM k JOIN hot USING (key)),
       |i AS (SELECT doc_id, pos,
       |        CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
       |              OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |                 > $SpanL
       |             THEN 1 ELSE 0 END AS ns
       |      FROM d),
       |si AS (SELECT doc_id, pos,
       |         sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
       |       FROM i),
       |sp AS (SELECT doc_id, min(pos) AS st, max(pos) + $SpanL - 1 AS en
       |       FROM si GROUP BY doc_id, sid),
       |cen AS (SELECT doc_id, count(*) AS n_spans,
       |          sum(en - st + 1) AS dup_tokens,
       |          max(en - st + 1) AS max_span
       |        FROM sp GROUP BY doc_id),
       |base AS (SELECT doc_id,
       |           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
       |         FROM documents)
       |SELECT b.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans,
       |  CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |  CAST(coalesce(max_span, 0) AS BIGINT) AS max_span,
       |  CAST(coalesce(dup_tokens, 0) * 1000000 // n_tokens AS BIGINT)
       |    AS dup_frac_micro
       |FROM base b LEFT JOIN cen USING (doc_id) ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q176
  // BM25 ranked retrieval (Okapi k1=1.2, b=0.75): the first three
  // documents act as queries, their distinct tokens score against
  // every other document — the retrieval scorer behind benchmark-
  // similarity decontamination sweeps (q47's tf-idf without length
  // normalization under-ranks short exact matches; BM25 is the
  // production weighting). Per-term contributions run one pinned IEEE
  // op sequence over exact-integer inputs and micronize to BIGINT
  // before the sum, so the top-10 hash-matches exactly.
  val Bm25K = 10

  val q176_bm25_topk: Q = (s, dir) =>
    graft.text.Bm25
      .topK(Tables.load(s, dir, "documents"), col("doc_id"), col("text"),
        col("doc_id") < 3, Bm25K)
      .orderBy("query_id", "rank")

  val q176_sql: String =
    s"""WITH toks AS (SELECT doc_id,
       |    UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
       |  FROM documents),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
       |post AS (SELECT t.doc_id, t.token, t.tf, d.dl
       |         FROM tf t JOIN dl d USING (doc_id)),
       |stats AS (SELECT count(*) AS nd, sum(dl) AS sdl FROM dl),
       |dfreq AS (SELECT token, count(*) AS df FROM post GROUP BY 1),
       |q AS (SELECT DISTINCT doc_id AS query_id, token FROM toks
       |      WHERE doc_id < 3),
       |sc AS (SELECT q.query_id, p.doc_id,
       |         CAST(sum(CAST(round((ln(1.0 + (s.nd - f.df + 0.5) / (f.df + 0.5))
       |               * (p.tf * CAST(2.2 AS DOUBLE))
       |               / (p.tf + CAST(1.2 AS DOUBLE)
       |                  * (0.25 + 0.75 * (p.dl * s.nd / s.sdl))))
       |             * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
       |       FROM post p JOIN q ON q.token = p.token
       |                          AND p.doc_id <> q.query_id
       |       JOIN dfreq f ON f.token = p.token CROSS JOIN stats s
       |       GROUP BY 1, 2),
       |r AS (SELECT query_id, doc_id, score_micro,
       |        row_number() OVER (PARTITION BY query_id
       |          ORDER BY score_micro DESC, doc_id) AS rank
       |      FROM sc)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score_micro
       |FROM r WHERE rank <= $Bm25K ORDER BY query_id, rank""".stripMargin

  // --------------------------------------------------------------- q188
  // Hybrid retrieval: reciprocal-rank fusion of the q176 BM25 list
  // and the dense cosine list over the SAME 3 queries (doc_id ≡
  // vec_id in the testdata) — the standard RAG first stage. Both
  // input lists are individually hash-matched pipelines, and each
  // 1/(60+rank) term micronizes to BIGINT before the fused sum, so
  // the fusion replays exactly. Fusion itself only ever touches
  // queries × k rows — the corpus-sized work stays in the retrievers.
  val RrfTopK = 10

  val q188_rrf_fusion: Q = (s, dir) => {
    val lex = graft.text.Bm25
      .topK(Tables.load(s, dir, "documents"), col("doc_id"), col("text"),
        col("doc_id") < 3, Bm25K)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val e = Tables.load(s, dir, "embeddings")
    val dense = graft.similarity.Similarity
      .bruteForceTopK(e, e.filter(col("vec_id") < 3), k = Bm25K)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    graft.similarity.Fusion.rrf(Seq(lex, dense), RrfTopK)
      .orderBy("query_id", "rank")
  }

  val q188_sql: String =
    s"""WITH lex AS MATERIALIZED ($q176_sql),
       |dsims AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
       |    round(list_sum(list_transform(generate_series(1, len(q.embedding)),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
       |      / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * x)))
       |         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * x)))), 6) AS sim
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id < 3 AND q.vec_id <> c.vec_id),
       |dense AS (
       |  SELECT query_id, doc_id, rank FROM (
       |    SELECT query_id, doc_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, doc_id ASC) AS rank
       |    FROM dsims) WHERE rank <= $Bm25K),
       |contrib AS (
       |  SELECT query_id, doc_id,
       |    CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS c FROM lex
       |  UNION ALL
       |  SELECT query_id, doc_id,
       |    CAST(round(1000000.0 / (60 + rank)) AS BIGINT) FROM dense),
       |f AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro,
       |        CAST(count(*) AS BIGINT) AS n_lists
       |      FROM contrib GROUP BY 1, 2),
       |r AS (SELECT query_id, doc_id, rrf_micro, n_lists,
       |        row_number() OVER (PARTITION BY query_id
       |          ORDER BY rrf_micro DESC, doc_id) AS rank
       |      FROM f)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, rrf_micro,
       |  n_lists
       |FROM r WHERE rank <= $RrfTopK ORDER BY query_id, rank""".stripMargin

  // --------------------------------------------------------------- q179
  // The span-dedup TRANSFORM (the other half of q175): corpus-wide
  // first occurrence of each duplicated >= 8-token window keeps its
  // text, every later occurrence's covering span is cut, documents
  // reassemble from surviving tokens. The md5 fingerprint of every
  // rewritten document hash-matches the DuckDB replay, so the edit
  // itself — not just the counts — is pinned.
  val q179_span_rewrite: Q = (s, dir) =>
    graft.text.SpanDedup
      .rewrite(Tables.load(s, dir, "documents"), col("doc_id"), col("text"),
        SpanL)
      .orderBy("doc_id")

  val q179_sql: String =
    s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       |              FROM documents),
       |w AS (SELECT doc_id, t,
       |        UNNEST(generate_series(0, len(t) - $SpanL)) AS pos
       |      FROM toks WHERE len(t) >= $SpanL),
       |k AS (SELECT doc_id, pos,
       |        substr(md5(array_to_string(
       |          list_slice(t, pos + 1, pos + $SpanL), ' ')), 1, 16) AS key
       |      FROM w),
       |hot AS (SELECT key FROM k GROUP BY key HAVING count(*) >= 2),
       |d AS (SELECT doc_id, pos, key FROM k JOIN hot USING (key)),
       |lat AS (SELECT doc_id, pos FROM (
       |          SELECT doc_id, pos,
       |            row_number() OVER (PARTITION BY key
       |              ORDER BY doc_id, pos) AS rn
       |          FROM d) WHERE rn > 1),
       |i AS (SELECT doc_id, pos,
       |        CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
       |              OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |                 > $SpanL
       |             THEN 1 ELSE 0 END AS ns
       |      FROM lat),
       |si AS (SELECT doc_id, pos,
       |         sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
       |       FROM i),
       |sp AS (SELECT doc_id, min(pos) AS st, max(pos) + $SpanL - 1 AS en
       |       FROM si GROUP BY doc_id, sid),
       |cov AS (SELECT doc_id, UNNEST(generate_series(st, en)) AS pos FROM sp),
       |tp AS (SELECT doc_id, UNNEST(generate_series(0, len(t) - 1)) AS pos, t
       |       FROM toks),
       |tok AS (SELECT doc_id, pos, t[pos + 1] AS token FROM tp),
       |kept AS (SELECT tok.doc_id, tok.pos, tok.token
       |         FROM tok LEFT JOIN cov
       |           ON cov.doc_id = tok.doc_id AND cov.pos = tok.pos
       |         WHERE cov.pos IS NULL),
       |re AS (SELECT doc_id, count(*) AS n_kept,
       |         md5(coalesce(string_agg(token, ' ' ORDER BY pos), ''))
       |           AS kept_fp
       |       FROM kept GROUP BY doc_id),
       |base AS (SELECT doc_id,
       |           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
       |         FROM documents)
       |SELECT b.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(n_tokens - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
       |  coalesce(kept_fp, md5('')) AS kept_fp
       |FROM base b LEFT JOIN re USING (doc_id) ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q180
  // Incremental-ingest span dedup: docs in md5-bucket 0 are the "new
  // batch" (q173's split), the rest the stored corpus; batch spans
  // already present in the corpus are found by joining the batch's
  // window keys against the corpus's DISTINCT keys — the span-level
  // member of the q156/q173 ingest family. Only batch-sized state
  // flows after the join; batch-internal duplication is the full
  // census's job, not the ingest check's.
  val q180_incremental_span_dedup: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val bucket =
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10
    graft.text.SpanDedup
      .incrementalCensus(docs.filter(bucket === 0), docs.filter(bucket =!= 0),
        col("doc_id"), col("text"), SpanL)
      .orderBy("doc_id")
  }

  val q180_sql: String =
    s"""WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       |              FROM documents),
       |bu AS (SELECT doc_id,
       |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
       |           % 10 AS b
       |       FROM documents),
       |w AS (SELECT doc_id, t,
       |        UNNEST(generate_series(0, len(t) - $SpanL)) AS pos
       |      FROM toks WHERE len(t) >= $SpanL),
       |k AS (SELECT doc_id, pos,
       |        substr(md5(array_to_string(
       |          list_slice(t, pos + 1, pos + $SpanL), ' ')), 1, 16) AS key
       |      FROM w),
       |ck AS (SELECT DISTINCT key FROM k JOIN bu USING (doc_id)
       |       WHERE bu.b <> 0),
       |d AS (SELECT k.doc_id, k.pos FROM k JOIN bu USING (doc_id)
       |      JOIN ck USING (key) WHERE bu.b = 0),
       |i AS (SELECT doc_id, pos,
       |        CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
       |              OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |                 > $SpanL
       |             THEN 1 ELSE 0 END AS ns
       |      FROM d),
       |si AS (SELECT doc_id, pos,
       |         sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
       |       FROM i),
       |sp AS (SELECT doc_id, min(pos) AS st, max(pos) + $SpanL - 1 AS en
       |       FROM si GROUP BY doc_id, sid),
       |cen AS (SELECT doc_id, count(*) AS n_spans,
       |          sum(en - st + 1) AS dup_tokens,
       |          max(en - st + 1) AS max_span
       |        FROM sp GROUP BY doc_id),
       |base AS (SELECT d.doc_id,
       |           len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
       |         FROM documents d JOIN bu ON bu.doc_id = d.doc_id
       |         WHERE bu.b = 0)
       |SELECT b.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans,
       |  CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |  CAST(coalesce(max_span, 0) AS BIGINT) AS max_span,
       |  CAST(coalesce(dup_tokens, 0) * 1000000 // n_tokens AS BIGINT)
       |    AS dup_frac_micro
       |FROM base b LEFT JOIN cen USING (doc_id) ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q181
  // Per-document 3-gram NOVELTY census: of each doc's distinct
  // shingles, the share first appearing in THIS doc (ingest order =
  // doc_id order) — the scheduling signal behind novelty-ordered
  // curricula, per-doc complement of q109's corpus growth curve.
  // 3-gram shingles, not tokens: the synthetic vocabulary saturates
  // instantly at the unigram level. Docs with < 3 tokens carry no
  // shingles and are (deliberately) absent.
  val q181_ngram_novelty: Q = (s, dir) => {
    import graft.text.TextAnalysis
    graft.text.Corpus
      .noveltyCensus(Tables.load(s, dir, "documents"), col("doc_id"),
        TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3))
      .orderBy("doc_id")
  }

  val q181_sql: String =
    """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      |              FROM documents),
      |g0 AS (SELECT doc_id, UNNEST(list_transform(
      |    generate_series(1, greatest(len(t) - 2, 0)),
      |    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS gram
      |  FROM toks),
      |g AS (SELECT DISTINCT doc_id, gram FROM g0),
      |fd AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1),
      |c AS (SELECT g.doc_id, count(*) AS n_grams,
      |        count(CASE WHEN fd.first_doc = g.doc_id THEN 1 END) AS n_new
      |      FROM g JOIN fd USING (gram) GROUP BY 1)
      |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
      |  CAST(n_new AS BIGINT) AS n_new,
      |  CAST(n_new * 1000000 // n_grams AS BIGINT) AS novelty_micro
      |FROM c ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q182
  // IVF-PQ: the production FAISS index — q78's checked coarse
  // quantizer routes each query to its 3 nearest of 8 cells, and ONLY
  // those cells' PQ codes (q172's checked codebooks) pay the ADC scan;
  // exact BIGINT re-rank closes the gap. The oracle composes BOTH
  // training replays (name-prefixed so the chains don't shadow each
  // other) plus routing, the cell-restricted ADC, and the re-rank.
  // Codes here are over raw vectors (the flat-code variant); q206 is
  // the residual-encoded twin (the FAISS default), integer-exact via
  // micro-floored cell centroids.
  val IvfPqNprobe = 3

  val q182_ivfpq_ann: Q = (s, dir) => {
    val e = Tables.load(s, dir, "embeddings")
    val idx = graft.similarity.Ivf.trainChecked(e, nlist = 8, iters = 3)
    val cents = graft.similarity.Pq.trainChecked(e, PqM, PqKsub, PqIters)
    graft.similarity.IvfPq
      .adcTopK(e, idx, cents, e.filter(col("vec_id") < 20),
        k = PqK, rerank = PqRerank, nprobe = IvfPqNprobe)
      .orderBy("query_id", "rank")
  }

  val q182_sql: String =
    "WITH " + graft.queries.TextSim.ivfCtes + ",\n" + pqMCte + ",\n" +
      pqTrainCtes + ",\n" +
      s"""probes AS (SELECT e.vec_id AS query_id, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${graft.queries.TextSim.ivfNd} DESC, c.cell DESC) AS pr
         |  FROM embeddings e CROSS JOIN cf c WHERE e.vec_id < 20),
         |qm AS (SELECT vec_id, mv FROM m WHERE vec_id < 20),
         |lut AS (SELECT q.vec_id AS query_id, c.sub, c.code,
         |          ${pqSdist("q", "c.sub", "c.cv")} AS ld
         |        FROM qm q CROSS JOIN pcf c),
         |cand AS (SELECT p.query_id, co.vec_id AS neighbor_id
         |         FROM probes p JOIN corpus co
         |           ON co.cell = p.cell AND p.pr <= $IvfPqNprobe
         |         WHERE co.vec_id <> p.query_id),
         |adc AS (SELECT ca.query_id, ca.neighbor_id,
         |          CAST(sum(l.ld) AS BIGINT) AS adist
         |        FROM cand ca JOIN pwf w ON w.vec_id = ca.neighbor_id
         |        JOIN lut l ON l.query_id = ca.query_id
         |                  AND l.sub = w.sub AND l.code = w.code
         |        GROUP BY 1, 2),
         |""".stripMargin + pqRerankSql

  // --------------------------------------------------------------- q206
  // RESIDUAL IVF-PQ (the default FAISS IndexIVFPQ encoding): PQ
  // codebooks learned over v - c(v) instead of raw vectors — residuals
  // concentrate near zero, so the same 8x256 codebook quantizes a much
  // tighter distribution. The integer-micro discipline survives by
  // flooring the cell centroid itself to micro units (sum div n), so
  // residuals are exact BIGINT differences and BOTH trainers replay.
  // Query-side consequence: the ADC LUT is per (query, probed cell) —
  // built from q - c(cell) — instead of per query; exact re-rank stays
  // on raw vectors. Retires q182's "residuals belong to the float
  // path" limitation.
  val q206_ivfpq_residual: Q = (s, dir) => {
    val e = Tables.load(s, dir, "embeddings")
    val idx = graft.similarity.Ivf.trainChecked(e, nlist = 8, iters = 3)
    graft.similarity.IvfPq
      .residualAdcTopK(e, idx, e.filter(col("vec_id") < 20),
        m = PqM, ksub = PqKsub, iters = PqIters,
        k = PqK, rerank = PqRerank, nprobe = IvfPqNprobe)
      .orderBy("query_id", "rank")
  }

  val q206_sql: String =
    "WITH " + graft.queries.TextSim.ivfCtes + ",\n" + pqMCte + ",\n" +
      s"""cmd AS (SELECT co.cell, g.d,
         |    CAST(sum(e.mv[g.d]) // count(*) AS BIGINT) AS cm
         |  FROM corpus co JOIN m e ON e.vec_id = co.vec_id
         |  CROSS JOIN (SELECT UNNEST(generate_series(1, $PqDim)) AS d) g
         |  GROUP BY 1, 2),
         |cml AS (SELECT cell, list(cm ORDER BY d) AS cmv FROM cmd GROUP BY 1),
         |rm AS MATERIALIZED (SELECT co.vec_id, co.cell,
         |    list_transform(generate_series(1, $PqDim),
         |      d -> e.mv[d] - cl.cmv[d]) AS mv
         |  FROM corpus co JOIN m e ON e.vec_id = co.vec_id
         |  JOIN cml cl ON cl.cell = co.cell),
         |""".stripMargin + pqTrainCtesOn("rm") + ",\n" +
      s"""probes AS (SELECT e.vec_id AS query_id, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${graft.queries.TextSim.ivfNd} DESC, c.cell DESC) AS pr
         |  FROM embeddings e CROSS JOIN cf c WHERE e.vec_id < 20),
         |qrm AS (SELECT p.query_id, p.cell,
         |    list_transform(generate_series(1, $PqDim),
         |      d -> q.mv[d] - cl.cmv[d]) AS mv
         |  FROM probes p JOIN m q ON q.vec_id = p.query_id
         |  JOIN cml cl ON cl.cell = p.cell
         |  WHERE p.pr <= $IvfPqNprobe),
         |lut AS (SELECT q.query_id, q.cell, c.sub, c.code,
         |          ${pqSdist("q", "c.sub", "c.cv")} AS ld
         |        FROM qrm q CROSS JOIN pcf c),
         |adc AS (SELECT l.query_id, w.vec_id AS neighbor_id,
         |          CAST(sum(l.ld) AS BIGINT) AS adist
         |        FROM pwf w JOIN rm r ON r.vec_id = w.vec_id
         |        JOIN lut l ON l.cell = r.cell
         |                  AND l.sub = w.sub AND l.code = w.code
         |        WHERE w.vec_id <> l.query_id
         |        GROUP BY 1, 2),
         |""".stripMargin + pqRerankSql

  // --------------------------------------------------------------- q207
  // Binary (sign-bit) quantization ANN: 1 bit per dimension, Hamming
  // shortlist, exact re-rank — the cheapest tier of the quantization
  // family (SQ q107 = 8 bits/dim, PQ q172 ~1 bit/dim learned, this =
  // 1 bit/dim free). ⌈dim/32⌉ 32-bit words per vector keep every
  // packed term exact under ANSI arithmetic (bit 63 of one 64-bit
  // word would need 2^63); the word count derives from the vector
  // length, so any dimensionality works (q215 checks a 48-dim
  // corpus). Same output contract and rerank tail as the PQ paths,
  // so the tiers are directly comparable.
  val q207_binary_ann: Q = (s, dir) => {
    val e = Tables.load(s, dir, "embeddings")
    graft.similarity.BinaryQ
      .topK(e, e.filter(col("vec_id") < 20), k = PqK, rerank = PqRerank)
      .orderBy("query_id", "rank")
  }

  val q207_sql: String = {
    def halfSql(tbl: String, h: Int) =
      s"CAST(list_sum(list_transform(generate_series(1, 32), d -> " +
        s"CASE WHEN $tbl.mv[d + ${32 * h}] > 0 " +
        s"THEN (1::BIGINT << CAST(d - 1 AS INT)) ELSE 0 END)) AS BIGINT)"
    "WITH " + pqMCte + ",\n" +
      s"""bc AS (SELECT vec_id, ${halfSql("m", 0)} AS lo,
         |          ${halfSql("m", 1)} AS hi
         |        FROM m),
         |qc AS (SELECT * FROM bc WHERE vec_id < 20),
         |adc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |          CAST(bit_count(xor(q.lo, c.lo))
         |             + bit_count(xor(q.hi, c.hi)) AS BIGINT) AS adist
         |        FROM qc q JOIN bc c ON c.vec_id <> q.vec_id),
         |""".stripMargin + pqRerankSql
  }

  // --------------------------------------------------------------- q215
  // Binary-quantization ANN on a NON-64-dim corpus (the first 48
  // coordinates of each embedding): proves BinaryQ's word packing is
  // dimension-general, not a 64-dim special case — 48 dims pack into
  // two words whose second carries only 16 live bits, and the Hamming
  // fold, shortlist, and exact re-rank are the same production path
  // q207 runs. An engine user's embeddings are whatever their encoder
  // emits (384, 768, 1024 …); the packer must derive its shape from
  // the data.
  val q215_binary_anydim: Q = (s, dir) => {
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), slice(col("embedding"), 1, 48).as("embedding"))
    graft.similarity.BinaryQ
      .topK(e, e.filter(col("vec_id") < 20), k = PqK, rerank = PqRerank)
      .orderBy("query_id", "rank")
  }

  val q215_sql: String = {
    // word h of the sign-bit code over the 48-dim slice; out-of-range
    // list extracts are NULL -> CASE falls to 0, matching the packer's
    // null-safe get
    def wordSql(tbl: String, h: Int) =
      s"CAST(list_sum(list_transform(generate_series(1, 32), d -> " +
        s"CASE WHEN $tbl.mv[d + ${32 * h}] > 0 " +
        s"THEN (1::BIGINT << CAST(d - 1 AS INT)) ELSE 0 END)) AS BIGINT)"
    s"""WITH m AS MATERIALIZED (SELECT vec_id, list_transform(embedding[1:48],
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS mv
       |  FROM embeddings),
       |bc AS (SELECT vec_id, ${wordSql("m", 0)} AS w0, ${wordSql("m", 1)} AS w1
       |       FROM m),
       |qc AS (SELECT * FROM bc WHERE vec_id < 20),
       |adc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |          CAST(bit_count(xor(q.w0, c.w0))
       |             + bit_count(xor(q.w1, c.w1)) AS BIGINT) AS adist
       |        FROM qc q JOIN bc c ON c.vec_id <> q.vec_id),
       |sl AS (SELECT query_id, neighbor_id, adist,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY adist, neighbor_id) AS arank
       |       FROM adc),
       |ex AS (SELECT s.query_id, s.neighbor_id, s.adist,
       |         CAST(list_sum(list_transform(generate_series(1, 48), d ->
       |           (q.mv[d] - c.mv[d]) * (q.mv[d] - c.mv[d]))) AS BIGINT) AS edist
       |       FROM sl s JOIN m c ON c.vec_id = s.neighbor_id
       |                 JOIN m q ON q.vec_id = s.query_id
       |       WHERE s.arank <= $PqRerank),
       |fin AS (SELECT query_id, neighbor_id, adist, edist,
       |          row_number() OVER (PARTITION BY query_id
       |            ORDER BY edist, neighbor_id) AS rank
       |        FROM ex)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, adist, edist
       |FROM fin WHERE rank <= $PqK ORDER BY query_id, rank""".stripMargin
  }

  // --------------------------------------------------------------- q218
  // Asymmetric binary ANN (ADC applied to the sign-bit quantizer):
  // identical corpus bytes to q207 — ⌈d/32⌉ words of sign bits — but
  // the QUERY never quantizes: the shortlist ranks by
  // −Σ_d q_d·(2·bit_d − 1), the query's exact micro magnitudes
  // weighting every dimension instead of counting sign flips equally.
  // The standard accuracy-for-free upgrade when queries are few and
  // the corpus is the thing that must stay small (FAISS's symmetric-
  // vs-ADC distinction, here at 1 bit/dim). All-integer end to end,
  // same output contract and exact re-rank tail as the other tiers.
  val q218_binary_asym: Q = (s, dir) => {
    val e = Tables.load(s, dir, "embeddings")
    graft.similarity.BinaryQ
      .topKAsymmetric(e, e.filter(col("vec_id") < 20), k = PqK, rerank = PqRerank)
      .orderBy("query_id", "rank")
  }

  val q218_sql: String = {
    def halfSql(tbl: String, h: Int) =
      s"CAST(list_sum(list_transform(generate_series(1, 32), d -> " +
        s"CASE WHEN $tbl.mv[d + ${32 * h}] > 0 " +
        s"THEN (1::BIGINT << CAST(d - 1 AS INT)) ELSE 0 END)) AS BIGINT)"
    "WITH " + pqMCte + ",\n" +
      s"""bc AS (SELECT vec_id, ${halfSql("m", 0)} AS lo,
         |          ${halfSql("m", 1)} AS hi
         |        FROM m),
         |qm AS (SELECT vec_id, mv FROM m WHERE vec_id < 20),
         |adc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CAST(-list_sum(list_transform(generate_series(1, 64), d ->
         |      q.mv[d] * (2 * ((CASE WHEN d <= 32 THEN c.lo ELSE c.hi END
         |        >> CAST((d - 1) % 32 AS INT)) & 1) - 1))) AS BIGINT) AS adist
         |  FROM qm q JOIN bc c ON c.vec_id <> q.vec_id),
         |""".stripMargin + pqRerankSql
  }

  // --------------------------------------------------------------- q208
  // ANN quantization-tier acceptance report: for each cheap tier
  // (binary sign-bit, SQ 16-bin, PQ 8x256), does the EXACT nearest
  // neighbor survive into the tier's rerank shortlist? The re-rank can
  // only fix what the shortlist contains, so top1-in-shortlist recall
  // isolates quantizer quality from rerank polish — this one table is
  // what picks the tier for a deployment (recall vs bytes/vector).
  // Membership in the k=rerank output IS shortlist membership, so
  // every tier reuses its production path unchanged.
  val q208_ann_tier_report: Q = (s, dir) => {
    import graft.similarity.{BinaryQ, Pq, Sq}
    val e = Tables.load(s, dir, "embeddings")
    val qs = e.filter(col("vec_id") < 20)
    val qm = qs.select(col("vec_id").as("query_id"),
      Sq.micronize(col("embedding")).as("qmv"))
    val store = e.select(col("vec_id").as("neighbor_id"),
      Sq.micronize(col("embedding")).as("mv"))
    val exact = store.crossJoin(broadcast(qm))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("aggregate(zip_with(qmv, mv, (a, b) -> (a - b) * (a - b)), " +
          "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("edist"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("edist").asc, col("neighbor_id").asc)
    val truth = exact.withColumn("rn", row_number().over(wq))
      .filter(col("rn") === 1).select(col("query_id"), col("neighbor_id").as("top1"))
    def tier(name: String, bytesPerVec: Int, sl: org.apache.spark.sql.DataFrame) = {
      val hits = truth.join(
        sl.select(col("query_id"), col("neighbor_id").as("top1")),
        Seq("query_id", "top1"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      truth.agg(count(lit(1)).as("n_queries"))
        .crossJoin(hits)
        .select(lit(name).as("tier"), lit(bytesPerVec).as("bytes_per_vec"),
          col("n_queries"), col("n_hit"),
          expr("n_hit * 1000000 div n_queries").as("recall_micro"))
    }
    val binSl = BinaryQ.topK(e, qs, k = PqRerank, rerank = PqRerank)
    val sqCb = Sq.fit(e, SqBins)
    val sqSl = Sq.adcTopK(Sq.encode(e, sqCb, SqBins), sqCb, e, qs,
      k = SqRerank, rerank = SqRerank, dim = SqDim, bins = SqBins)
    val pqSl = Pq.adcTopK(e, Pq.trainChecked(e, PqM, PqKsub, PqIters), qs,
      k = PqRerank, rerank = PqRerank)
    tier("binary_1bit", 8, binSl)
      .unionByName(tier("sq_16bin", 32, sqSl))
      .unionByName(tier("pq_8x256", 8, pqSl))
      .orderBy("tier")
  }

  val q208_sql: String = {
    def halfSql(tbl: String, h: Int) =
      s"CAST(list_sum(list_transform(generate_series(1, 32), d -> " +
        s"CASE WHEN $tbl.mv[d + ${32 * h}] > 0 " +
        s"THEN (1::BIGINT << CAST(d - 1 AS INT)) ELSE 0 END)) AS BIGINT)"
    def edist(q: String, c: String) =
      s"CAST(list_sum(list_transform(generate_series(1, $SqDim), d -> " +
        s"($q.mv[d] - $c.mv[d]) * ($q.mv[d] - $c.mv[d]))) AS BIGINT)"
    "WITH " + pqMCte + ",\n" + sqCodebookCtes + ",\n" + pqTrainCtes + ",\n" +
      s"""qs AS (SELECT vec_id AS query_id, mv FROM m WHERE vec_id < 20),
         |tr AS (SELECT query_id, neighbor_id AS top1 FROM (
         |    SELECT q.query_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY ${edist("q", "c")}, c.vec_id) AS rn
         |    FROM qs q JOIN m c ON c.vec_id <> q.query_id) WHERE rn = 1),
         |bc AS (SELECT vec_id, ${halfSql("m", 0)} AS lo, ${halfSql("m", 1)} AS hi
         |       FROM m),
         |bsl AS (SELECT query_id, neighbor_id FROM (
         |    SELECT q.query_id, c.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.query_id
         |        ORDER BY bit_count(xor(qb.lo, c.lo)) + bit_count(xor(qb.hi, c.hi)),
         |                 c.vec_id) AS rn
         |    FROM qs q JOIN bc qb ON qb.vec_id = q.query_id
         |    JOIN bc c ON c.vec_id <> q.query_id) WHERE rn <= $PqRerank),
         |ssl AS (SELECT query_id, neighbor_id FROM (
         |    SELECT q.query_id, x.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.query_id ORDER BY
         |        CAST(list_sum(list_transform(generate_series(1, $SqDim), d ->
         |          (q.mv[d] - cs.cents[(d - 1) * $SqBins + x.codes[d] + 1])
         |          * (q.mv[d] - cs.cents[(d - 1) * $SqBins + x.codes[d] + 1])))
         |          AS BIGINT), x.vec_id) AS rn
         |    FROM qs q, codes x, cents cs
         |    WHERE x.vec_id <> q.query_id) WHERE rn <= $SqRerank),
         |plut AS (SELECT q.query_id, c.sub, c.code,
         |           ${pqSdist("q", "c.sub", "c.cv")} AS ld
         |         FROM qs q CROSS JOIN pcf c),
         |padc AS (SELECT l.query_id, w.vec_id AS neighbor_id,
         |           CAST(sum(l.ld) AS BIGINT) AS adist
         |         FROM pwf w JOIN plut l ON l.sub = w.sub AND l.code = w.code
         |         WHERE w.vec_id <> l.query_id GROUP BY 1, 2),
         |psl AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY adist, neighbor_id) AS rn
         |    FROM padc) WHERE rn <= $PqRerank),
         |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM tr),
         |rb AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
         |       FROM tr JOIN bsl ON bsl.query_id = tr.query_id
         |                       AND bsl.neighbor_id = tr.top1),
         |rs AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
         |       FROM tr JOIN ssl ON ssl.query_id = tr.query_id
         |                       AND ssl.neighbor_id = tr.top1),
         |rp AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
         |       FROM tr JOIN psl ON psl.query_id = tr.query_id
         |                       AND psl.neighbor_id = tr.top1)
         |SELECT 'binary_1bit' AS tier, 8 AS bytes_per_vec, n_queries, n_hit,
         |  n_hit * 1000000 // n_queries AS recall_micro FROM nq, rb
         |UNION ALL
         |SELECT 'pq_8x256', 8, n_queries, n_hit,
         |  n_hit * 1000000 // n_queries FROM nq, rp
         |UNION ALL
         |SELECT 'sq_16bin', 32, n_queries, n_hit,
         |  n_hit * 1000000 // n_queries FROM nq, rs
         |ORDER BY tier""".stripMargin
  }

  // --------------------------------------------------------------- q209
  // Incremental exact top-k maintenance: when a batch of new vectors
  // lands, the stored per-query top-k lists update by re-ranking
  // (old top-k UNION query x batch scores) — provably equal to a full
  // recompute (the true top-k of the union is contained in it), at
  // O(batch + queries*k) cost instead of O(corpus). The similarity-
  // search sibling of q201's rollup merge; the oracle recomputes over
  // the FULL corpus in one shot and hash equality proves
  // maintenance = recompute. Exact integer micro distances throughout.
  //
  // Both rank passes run through the bounded-heap TopKByScore
  // aggregate (q73's operator), NOT a row_number window: map-side
  // partial combine ships at most k entries per query per task into
  // the shuffle, where the window formulation would shuffle and sort
  // every (query, candidate) score — the difference between shuffling
  // the answer and shuffling the corpus when the maintained state is
  // production-sized. score = −edist as DOUBLE is exact: micro
  // distances cap at dim·(2·10⁶)² ≈ 2.6·10¹⁴ < 2⁵³, and the heap's
  // (score DESC, id ASC) order is precisely (edist ASC, id ASC).
  val IncK = 5

  val q209_incremental_topk: Q = (s, dir) => {
    import graft.similarity.Sq
    val e = Tables.load(s, dir, "embeddings")
      .filter(graft.similarity.Similarity.finiteVec(col("embedding")))
    val qm = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"),
        Sq.micronize(col("embedding")).as("qmv"))
    def scores(part: org.apache.spark.sql.DataFrame) =
      part.select(col("vec_id").as("neighbor_id"),
        Sq.micronize(col("embedding")).as("mv"))
        .crossJoin(broadcast(qm))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          expr("aggregate(zip_with(qmv, mv, (a, b) -> (a - b) * (a - b)), " +
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("edist"))
    def topk(cand: org.apache.spark.sql.DataFrame) = cand
      .groupBy("query_id")
      .agg(graft.expressions.TopKAgg.top_k_ids(
        negate(col("edist")).cast("double"), col("neighbor_id"), IncK).as("top"))
    // the maintained state: top-k over the STORED corpus only
    val stored = topk(scores(e.filter(col("vec_id") % 7 =!= 0)))
      .select(col("query_id"), explode(col("top")).as("e"))
      .select(col("query_id"), col("e.id").as("neighbor_id"),
        negate(col("e.score")).cast("long").as("edist"))
    // the ingest: batch-sized scoring, then merge + re-rank
    val batch = scores(e.filter(col("vec_id") % 7 === 0))
    topk(stored.unionByName(batch))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("query_id"), (col("i") + 1).cast("long").as("rank"),
        col("e.id").as("neighbor_id"),
        negate(col("e.score")).cast("long").as("edist"))
      .orderBy("query_id", "rank")
  }

  val q209_sql: String =
    s"""WITH m AS (SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS mv
       |  FROM embeddings),
       |qs AS (SELECT vec_id AS query_id, mv FROM m WHERE vec_id < 20),
       |d AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |        CAST(list_sum(list_transform(generate_series(1, $SqDim), k ->
       |          (q.mv[k] - c.mv[k]) * (q.mv[k] - c.mv[k]))) AS BIGINT)
       |          AS edist
       |      FROM qs q JOIN m c ON c.vec_id <> q.query_id)
       |SELECT query_id, rank, neighbor_id, edist FROM (
       |  SELECT query_id, neighbor_id, edist,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY edist, neighbor_id) AS BIGINT) AS rank
       |  FROM d) WHERE rank <= $IncK
       |ORDER BY query_id, rank""".stripMargin

  // --------------------------------------------------------------- q204
  // Chat-transcript validation census (the SFT-data structural gate):
  // parse "role: content | ..." transcripts, check starts-with-user /
  // strict-alternation / ends-with-assistant / known-roles / no-empty-
  // turns, and account the assistant-token fraction — the share of
  // tokens that receive loss under completion-only masking. The
  // corpus has no conversations, so each doc renders into one of four
  // deterministic shapes (two well-formed, a role-repeat, and an
  // assistant-first) — every validator branch fires at the gate.
  val q204_chat_census: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val tk = split(trim(col("text")), "\\s+")
    def chunk(i: Int) = array_join(slice(tk, 3 * i + 1, 3), " ")
    val tr = when(col("doc_id") % 4 === 0,
      concat(lit("user: "), chunk(0), lit(" | assistant: "), chunk(1)))
      .when(col("doc_id") % 4 === 1,
        concat(lit("user: "), chunk(0), lit(" | assistant: "), chunk(1),
          lit(" | user: "), chunk(2), lit(" | assistant: "), chunk(3)))
      .when(col("doc_id") % 4 === 2,
        concat(lit("user: "), chunk(0), lit(" | user: "), chunk(1),
          lit(" | assistant: "), chunk(2)))
      .otherwise(
        concat(lit("assistant: "), chunk(0), lit(" | user: "), chunk(1)))
    graft.text.Chat
      .turnCensus(docs.select(col("doc_id"), tr.as("tr")),
        col("doc_id"), col("tr"))
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  val q204_sql: String =
    """WITH t0 AS (SELECT doc_id,
      |    regexp_split_to_array(trim(text), '\s+') AS tk FROM documents),
      |c AS (SELECT doc_id,
      |    array_to_string(list_slice(tk, 1, 3), ' ') AS c0,
      |    array_to_string(list_slice(tk, 4, 6), ' ') AS c1,
      |    array_to_string(list_slice(tk, 7, 9), ' ') AS c2,
      |    array_to_string(list_slice(tk, 10, 12), ' ') AS c3
      |  FROM t0),
      |tr AS (SELECT doc_id, CASE doc_id % 4
      |    WHEN 0 THEN 'user: ' || c0 || ' | assistant: ' || c1
      |    WHEN 1 THEN 'user: ' || c0 || ' | assistant: ' || c1
      |                || ' | user: ' || c2 || ' | assistant: ' || c3
      |    WHEN 2 THEN 'user: ' || c0 || ' | user: ' || c1
      |                || ' | assistant: ' || c2
      |    ELSE 'assistant: ' || c0 || ' | user: ' || c1 END AS t FROM c),
      |p AS (SELECT doc_id,
      |    list_transform(string_split(t, ' | '),
      |      s -> split_part(s, ': ', 1)) AS r,
      |    list_transform(string_split(t, ' | '),
      |      s -> split_part(s, ': ', 2)) AS cc
      |  FROM tr),
      |f AS (SELECT doc_id,
      |    CAST(len(r) AS BIGINT) AS n_turns,
      |    r[1] = 'user' AS starts_user,
      |    len(list_filter(r, x -> x NOT IN ('user', 'assistant'))) = 0
      |      AS roles_ok,
      |    len(list_filter(generate_series(1, len(r) - 1),
      |      i -> r[i] = r[i + 1])) = 0 AS alternates,
      |    r[len(r)] = 'assistant' AS ends_assistant,
      |    len(list_filter(cc, x -> length(x) = 0)) = 0 AS contents_ok,
      |    CAST(list_sum(list_transform(generate_series(1, len(r)),
      |      i -> CASE WHEN r[i] = 'assistant'
      |                THEN len(regexp_split_to_array(cc[i], '\s+'))
      |                ELSE 0 END)) AS BIGINT) AS n_assistant_tokens,
      |    CAST(list_sum(list_transform(cc,
      |      x -> len(regexp_split_to_array(x, '\s+')))) AS BIGINT)
      |      AS n_total_tokens
      |  FROM p)
      |SELECT doc_id, n_turns, starts_user, roles_ok, alternates,
      |  ends_assistant, contents_ok, n_assistant_tokens, n_total_tokens,
      |  n_assistant_tokens * 1000000 // greatest(n_total_tokens, 1)
      |    AS assistant_frac_micro,
      |  n_turns >= 2 AND starts_user AND roles_ok AND alternates
      |    AND ends_assistant AND contents_ok AS valid
      |FROM f ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q199
  // MMR diversity-aware selection (Carbonell & Goldstein 1998): greedy
  // top-k where each round's pick maximizes quality minus
  // lambda * max-SimHash-similarity to the already-selected set — the
  // curation step that stops "take the k best docs" from returning k
  // near-clones. Quality = distinct-token ratio (micro-units);
  // similarity = 60-bit-SimHash bit overlap; the penalty is an integer
  // div on non-negative operands, so the whole greedy trace is exact
  // and the oracle replays all k rounds as unrolled CTEs. The
  // corpus-sized work is ONE scoring pass + TakeOrderedAndProject to a
  // 40-doc shortlist; the rounds run on the checkpointed shortlist.
  val MmrK = 8
  val MmrShortlist = 40
  val MmrLambdaMicro = 500000L

  val q199_mmr_select: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val t = split(trim(col("text")), "\\s+")
    val scored = docs.select(col("doc_id"),
        size(t).cast("long").as("n_tok"),
        size(array_distinct(t)).cast("long").as("n_distinct"),
        graft.dedup.Dedup.simhash64(col("text"),
          graft.dedup.Dedup.md5Hash60).as("sig"))
      .withColumn("q_micro", expr("(n_distinct * 1000000) div n_tok"))
    val cands = scored
      .orderBy(col("q_micro").desc, col("doc_id")).limit(MmrShortlist)
    graft.operators.Mmr.select(cands, MmrK, MmrLambdaMicro)
  }

  val q199_sql: String = {
    val bits = (0 until 60).map { i =>
      s"(CASE WHEN 2*len(list_filter(hs, x -> ((x >> $i) & 1) = 1)) > len(hs) " +
        s"THEN ${1L << i} ELSE 0 END)"
    }.mkString("\n      + ")
    val steps = (2 to MmrK).map { t =>
      s"""s$t AS MATERIALIZED (
         |  SELECT * FROM s${t - 1}
         |  UNION ALL
         |  SELECT $t AS sel_rank, doc_id, q_micro, sig, min_hamming, mmr_micro
         |  FROM (
         |    SELECT c.doc_id, c.q_micro, c.sig,
         |      CAST(min(bit_count(xor(c.sig, s.sig))) AS BIGINT) AS min_hamming,
         |      c.q_micro - ($MmrLambdaMicro
         |        * (60 - CAST(min(bit_count(xor(c.sig, s.sig))) AS BIGINT))) // 60
         |        AS mmr_micro
         |    FROM c0 c JOIN s${t - 1} s ON true
         |    WHERE c.doc_id NOT IN (SELECT doc_id FROM s${t - 1})
         |    GROUP BY c.doc_id, c.q_micro, c.sig
         |    ORDER BY mmr_micro DESC, c.doc_id LIMIT 1))""".stripMargin
    }.mkString(",\n")
    s"""WITH t0 AS (SELECT doc_id,
       |    regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents),
       |h AS (SELECT doc_id,
       |    CAST(len(list_distinct(tk)) * 1000000 AS BIGINT)
       |      // CAST(len(tk) AS BIGINT) AS q_micro,
       |    list_transform(tk,
       |      t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)) AS hs
       |  FROM t0),
       |sq AS (SELECT doc_id, q_micro, CAST($bits AS BIGINT) AS sig FROM h),
       |c0 AS MATERIALIZED (SELECT doc_id, q_micro, sig FROM sq
       |    ORDER BY q_micro DESC, doc_id LIMIT $MmrShortlist),
       |s1 AS MATERIALIZED (SELECT 1 AS sel_rank, doc_id, q_micro, sig,
       |    CAST(NULL AS BIGINT) AS min_hamming, q_micro AS mmr_micro
       |  FROM c0 ORDER BY q_micro DESC, doc_id LIMIT 1),
       |$steps
       |SELECT sel_rank, doc_id, q_micro, min_hamming, mmr_micro
       |FROM s$MmrK ORDER BY sel_rank""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q199_mmr_select" -> q199_mmr_select,
    "q204_chat_census" -> q204_chat_census,
    "q206_ivfpq_residual" -> q206_ivfpq_residual,
    "q207_binary_ann" -> q207_binary_ann,
    "q215_binary_anydim" -> q215_binary_anydim,
    "q218_binary_asym" -> q218_binary_asym,
    "q208_ann_tier_report" -> q208_ann_tier_report,
    "q209_incremental_topk" -> q209_incremental_topk,
    "q188_rrf_fusion" -> q188_rrf_fusion,
    "q184_boilerplate" -> q184_boilerplate,
    "q182_ivfpq_ann" -> q182_ivfpq_ann,
    "q181_ngram_novelty" -> q181_ngram_novelty,
    "q180_incremental_span_dedup" -> q180_incremental_span_dedup,
    "q179_span_rewrite" -> q179_span_rewrite,
    "q176_bm25_topk" -> q176_bm25_topk,
    "q175_span_dedup" -> q175_span_dedup,
    "q174_dsir_select" -> q174_dsir_select,
    "q173_bloom_line_dedup" -> q173_bloom_line_dedup,
    "q172_pq_ann" -> q172_pq_ann,
    "q166_quota_select" -> q166_quota_select,
    "q106_line_dedup" -> q106_line_dedup,
    "q107_sq_ann" -> q107_sq_ann,
    "q108_ks_drift" -> q108_ks_drift,
    "q109_vocab_growth" -> q109_vocab_growth,
    "q110_scd2" -> q110_scd2,
    "q111_pagerank" -> q111_pagerank,
    "q112_quality_score" -> q112_quality_score,
    "q113_zorder" -> q113_zorder,
    "q115_chi2" -> q115_chi2,
    "q116_incremental_stats" -> q116_incremental_stats,
    "q148_shuffle_shards" -> q148_shuffle_shards)

  val oracle: Map[String, String] = Map(
    "q199_mmr_select" -> q199_sql,
    "q204_chat_census" -> q204_sql,
    "q206_ivfpq_residual" -> q206_sql,
    "q207_binary_ann" -> q207_sql,
    "q215_binary_anydim" -> q215_sql,
    "q218_binary_asym" -> q218_sql,
    "q208_ann_tier_report" -> q208_sql,
    "q209_incremental_topk" -> q209_sql,
    "q188_rrf_fusion" -> q188_sql,
    "q184_boilerplate" -> q184_sql,
    "q182_ivfpq_ann" -> q182_sql,
    "q181_ngram_novelty" -> q181_sql,
    "q180_incremental_span_dedup" -> q180_sql,
    "q179_span_rewrite" -> q179_sql,
    "q176_bm25_topk" -> q176_sql,
    "q175_span_dedup" -> q175_sql,
    "q174_dsir_select" -> q174_sql,
    "q173_bloom_line_dedup" -> q173_sql,
    "q172_pq_ann" -> q172_sql,
    "q166_quota_select" -> q166_sql,
    "q106_line_dedup" -> q106_sql,
    "q107_sq_ann" -> q107_sql,
    "q108_ks_drift" -> q108_sql,
    "q109_vocab_growth" -> q109_sql,
    "q110_scd2" -> q110_sql,
    "q111_pagerank" -> q111_sql,
    "q112_quality_score" -> q112_sql,
    "q113_zorder" -> q113_sql,
    "q115_chi2" -> q115_sql,
    "q116_incremental_stats" -> q116_sql,
    "q148_shuffle_shards" -> q148_sql)
}

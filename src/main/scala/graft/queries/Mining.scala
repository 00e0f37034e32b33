package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-mining additions over the curation graph and event log:
  * triangle cohesion, character-level fuzzy dedup, asymmetric
  * containment, Markov behavioral transitions, and the temperature-
  * flattened pretraining mixture. Every query hash-checks against the
  * DuckDB oracle (integer counts, 6dp-rounded ratios, and sqrt — the
  * one correctly-rounded IEEE transcendental — only).
  */
object Mining {

  type Q = (SparkSession, String) => DataFrame

  // --------------------------------------------------------------- q117
  // Per-document triangle census over the duplicate-cluster graph
  // (same line-share edges as q111's PageRank): triangle-dense nodes
  // sit in near-identical clusters, triangle-free high-degree nodes
  // are chain/boilerplate artifacts — the signal that picks which
  // clusters to canonicalize aggressively.
  val q117_triangles: Q = (s, dir) => {
    val lines = graft.text.LineDedup.chunkLines(
      Tables.load(s, dir, "documents"), col("doc_id"), col("text"),
      Curation.LineTokens)
    val edges = graft.text.LineDedup.shareEdges(
      lines, Curation.PrMinDocs, Curation.PrMaxDocs)
    graft.graph.Triangles.nodeTriangles(edges)
      .select(col("node").as("doc_id"), col("degree"), col("n_tri"))
      .orderBy("doc_id")
  }

  val q117_sql: String =
    s"""WITH ${Curation.shareEdgesCtes},
       |und AS (SELECT src, dst FROM edges WHERE src < dst),
       |tri AS (SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
       |        FROM und w1 JOIN und w2 ON w1.dst = w2.src
       |        JOIN und w3 ON w3.src = w1.src AND w3.dst = w2.dst),
       |pn AS (SELECT node, count(*) AS n_tri FROM (
       |         SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
       |         UNION ALL SELECT c FROM tri) GROUP BY node),
       |deg AS (SELECT src AS node, count(*) AS degree FROM edges GROUP BY src)
       |SELECT deg.node AS doc_id, CAST(degree AS BIGINT) AS degree,
       |  CAST(coalesce(n_tri, 0) AS BIGINT) AS n_tri
       |FROM deg LEFT JOIN pn USING (node) ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q118
  // Blocked Levenshtein fuzzy dedup: character-level near-dups the
  // token-set operators blur (typo/OCR variants). Candidates only
  // within (first-token, length-bucket) blocks; distance on a 40-char
  // prefix. Integer DP distance — hash-exact in any engine.
  val EdMaxDist = 5
  val EdPrefix = 40
  val EdLenBucket = 64

  val q118_edit_distance: Q = (s, dir) =>
    graft.dedup.FuzzyDedup.editDistancePairs(
      Tables.load(s, dir, "documents"), col("doc_id"), col("text"),
      maxDist = EdMaxDist, prefixLen = EdPrefix, lenBucket = EdLenBucket)
      .orderBy("id_a", "id_b")

  val q118_sql: String =
    s"""WITH b AS (SELECT doc_id, substring(text, 1, $EdPrefix) AS pfx,
       |             regexp_split_to_array(trim(text), '\\s+')[1] AS tok1,
       |             length(text) // $EdLenBucket AS lb
       |           FROM documents)
       |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
       |  CAST(levenshtein(a.pfx, c.pfx) AS BIGINT) AS dist
       |FROM b a JOIN b c
       |  ON a.tok1 = c.tok1 AND a.lb = c.lb AND a.doc_id < c.doc_id
       |WHERE levenshtein(a.pfx, c.pfx) <= $EdMaxDist
       |ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------------------- q119
  // Asymmetric containment join over 3-gram shingles (full corpus,
  // same df-cut as q96): finds quote/boilerplate CONTAINMENT that
  // symmetric Jaccard misses. Kept when either direction ≥ 0.6.
  val CtThreshold = 0.6
  val CtMaxDf = 0.006

  val q119_containment: Q = (s, dir) =>
    graft.dedup.Dedup.containmentJoinOn(
      Tables.load(s, dir, "documents"), col("doc_id"),
      graft.text.TextAnalysis.ngrams(
        graft.text.TextAnalysis.tokens(col("text")), 3),
      threshold = CtThreshold, maxDocFrequency = CtMaxDf)
      .orderBy("id_a", "id_b")

  /** Shared CTE chain for the df-cut containment pair table — q119
    * (pair-list demo) and q231 (per-doc census) select from the SAME
    * `pairs` relation, so the two oracles cannot drift (the q122/q222
    * discipline). `pairs` is MATERIALIZED: q231 references it twice
    * (both pair directions) and DuckDB inlines plain CTEs per
    * reference. */
  private val ctPairCtes: String =
    s"""d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |           FROM documents),
       |g AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS gs FROM d),
       |w AS (SELECT DISTINCT doc_id, UNNEST(gs) AS tok FROM g),
       |sz AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
       |dfreq AS (SELECT tok, count(*) AS df FROM w GROUP BY tok),
       |cut AS (SELECT greatest(1, CAST(floor($CtMaxDf * count(*)) AS BIGINT)) AS c
       |        FROM d),
       |wcut AS (SELECT w.doc_id, w.tok FROM w JOIN dfreq USING (tok), cut
       |         WHERE dfreq.df <= cut.c),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |          FROM wcut a JOIN wcut b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |pairs AS MATERIALIZED (
       |  SELECT id_a, id_b, CAST(i AS BIGINT) AS inter,
       |    CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
       |    round(CAST(i AS DOUBLE) / sa.sz, 6) AS cont_a_in_b,
       |    round(CAST(i AS DOUBLE) / sb.sz, 6) AS cont_b_in_a
       |  FROM inter
       |  JOIN sz sa ON id_a = sa.doc_id
       |  JOIN sz sb ON id_b = sb.doc_id
       |  WHERE greatest(round(CAST(i AS DOUBLE) / sa.sz, 6),
       |                 round(CAST(i AS DOUBLE) / sb.sz, 6)) >= $CtThreshold)""".stripMargin

  val q119_sql: String =
    s"""WITH $ctPairCtes
       |SELECT id_a, id_b, inter, sz_a, sz_b, cont_a_in_b, cont_b_in_a
       |FROM pairs ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------------------- q231
  // Per-document containment census — q119's count-first scale path
  // (the q122→q222 pattern, closing the last answer-sized pair demo):
  // one row per doc with its partner count, strongest containment
  // inside a partner, and deterministic top partner. The sorted
  // answer-sized pair output disappears; only the census shuffles.
  val q231_containment_census: Q = (s, dir) =>
    graft.dedup.Dedup.containmentCensus(
      Tables.load(s, dir, "documents"), col("doc_id"),
      graft.text.TextAnalysis.ngrams(
        graft.text.TextAnalysis.tokens(col("text")), 3),
      threshold = CtThreshold, maxDocFrequency = CtMaxDf)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  val q231_sql: String =
    s"""WITH $ctPairCtes,
       |perdir AS (SELECT id_a AS id, id_b AS partner, cont_a_in_b AS c FROM pairs
       |           UNION ALL
       |           SELECT id_b AS id, id_a AS partner, cont_b_in_a AS c FROM pairs),
       |r AS (SELECT id, partner, c,
       |        row_number() OVER (PARTITION BY id ORDER BY c DESC, partner ASC) AS rn
       |      FROM perdir)
       |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_partners,
       |  max(c) AS c_max,
       |  CAST(min(CASE WHEN rn = 1 THEN partner END) AS BIGINT) AS top_partner
       |FROM r GROUP BY id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q120
  // First-order Markov transition matrix over per-user event streams:
  // P(next event-type | current), the behavioral-modeling counterpart
  // of funnel/retention. Window keyed by user (bounded partitions),
  // 6dp-rounded row-normalized probabilities.
  val q120_markov: Q = (s, dir) =>
    graft.analytics.Markov.transitions(
      Tables.load(s, dir, "events"), col("user_id"), col("event_type"),
      Seq(col("ts"), col("event_id")))
      .orderBy("prev_state", "next_state")

  val q120_sql: String =
    """WITH s AS (SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |c AS (SELECT prev AS prev_state, event_type AS next_state, count(*) AS n
      |      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT prev_state, sum(n) AS row_n FROM c GROUP BY prev_state)
      |SELECT c.prev_state, c.next_state, CAST(n AS BIGINT) AS n,
      |  round(CAST(n AS DOUBLE) / row_n, 6) AS p
      |FROM c JOIN t USING (prev_state)
      |ORDER BY prev_state, next_state""".stripMargin

  // --------------------------------------------------------------- q121
  // Temperature-flattened pretraining mixture (t = 0.5): per-source
  // sampling weight ∝ √count in integer micro-units, share and a
  // floor-division document allocation against a fixed budget. sqrt
  // is correctly-rounded IEEE — the one transcendental that
  // hash-matches across engines.
  val MixBudget = 10000L

  val q121_temperature_mixture: Q = (s, dir) =>
    graft.operators.Sampling.sqrtTemperatureMixture(
      Tables.load(s, dir, "documents"), col("source"), MixBudget)
      .orderBy("domain")

  val q121_sql: String =
    s"""WITH c AS (SELECT source AS domain, count(*) AS n_docs
       |           FROM documents GROUP BY 1),
       |w AS (SELECT domain, n_docs,
       |        CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1e6) AS BIGINT)
       |          AS w_micro
       |      FROM c),
       |t AS (SELECT sum(w_micro) AS tot_w FROM w)
       |SELECT domain, CAST(n_docs AS BIGINT) AS n_docs, w_micro,
       |  round(CAST(w_micro AS DOUBLE) / tot_w, 6) AS share,
       |  CAST(($MixBudget * w_micro) // tot_w AS BIGINT) AS alloc_docs
       |FROM w, t ORDER BY domain""".stripMargin

  // --------------------------------------------------------------- q122
  // Rarity-weighted overlap join: shared 3-gram shingles weighted
  // 1e6 div df — one rare shared shingle outweighs boilerplate; BIGINT
  // weights sum exactly (order-free), unlike float IDF.
  val WoMinWeight = 3000000L

  val q122_weighted_overlap: Q = (s, dir) =>
    graft.dedup.Dedup.weightedOverlapJoinOn(
      Tables.load(s, dir, "documents"), col("doc_id"),
      graft.text.TextAnalysis.ngrams(
        graft.text.TextAnalysis.tokens(col("text")), 3),
      minWeight = WoMinWeight)
      .orderBy("id_a", "id_b")

  /** Shared CTE chain for the rarity-weighted overlap pair table —
    * q122 (pair-list demo) and q222 (per-doc census) select from the
    * SAME `pairs` relation, so the two oracles cannot drift. `pairs`
    * is MATERIALIZED: q222 references it twice (both pair directions)
    * and DuckDB inlines plain CTEs per reference. */
  private val woPairCtes: String =
    s"""d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |           FROM documents),
       |g AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS gs FROM d),
       |w AS (SELECT DISTINCT doc_id, UNNEST(gs) AS tok FROM g),
       |dfreq AS (SELECT tok, count(*) AS df FROM w GROUP BY tok),
       |wi AS (SELECT w.doc_id, w.tok, 1000000 // dfreq.df AS wt
       |       FROM w JOIN dfreq USING (tok)),
       |pairs AS MATERIALIZED (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(count(*) AS BIGINT) AS inter,
       |    CAST(sum(a.wt) AS BIGINT) AS w_overlap
       |  FROM wi a JOIN wi b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |  HAVING sum(a.wt) >= $WoMinWeight)""".stripMargin

  val q122_sql: String =
    s"""WITH $woPairCtes
       |SELECT id_a, id_b, inter, w_overlap FROM pairs
       |ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------------------- q222
  // Per-document weighted-overlap census — q122's count-first scale
  // path (the q195→q210 pattern): the pair list's size IS its answer,
  // so the shipping form is one row per document with its partner
  // count, strongest weight, and deterministic top partner. The sorted
  // corpus-sized pair output disappears; only the census shuffles.
  // plainPairs = true: q222 stays the adjudicated PLAIN-join census
  // demo (the q122 pair source). The library default now routes
  // uncut censuses through the prefix-filtered candidate scheme —
  // that default path is q238's claim, measured there.
  val q222_overlap_census: Q = (s, dir) =>
    graft.dedup.Dedup.weightedOverlapCensus(
      Tables.load(s, dir, "documents"), col("doc_id"),
      graft.text.TextAnalysis.ngrams(
        graft.text.TextAnalysis.tokens(col("text")), 3),
      minWeight = WoMinWeight, plainPairs = true)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  val q222_sql: String =
    s"""WITH $woPairCtes,
       |perdir AS (SELECT id_a AS id, id_b AS partner, w_overlap FROM pairs
       |           UNION ALL
       |           SELECT id_b AS id, id_a AS partner, w_overlap FROM pairs),
       |r AS (SELECT id, partner, w_overlap,
       |        row_number() OVER (PARTITION BY id
       |                           ORDER BY w_overlap DESC, partner ASC) AS rn
       |      FROM perdir)
       |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_partners,
       |  CAST(max(w_overlap) AS BIGINT) AS w_max,
       |  CAST(min(CASE WHEN rn = 1 THEN partner END) AS BIGINT) AS top_partner
       |FROM r GROUP BY id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q235
  // Prefix-filtered EXACT rarity-weighted overlap join — the q234/q211
  // completeness pattern applied to the LAST GB-spill family without a
  // bounded twin: heaviest-first ordering keeps an item only while the
  // doc's remaining weight mass still clears minWeight, so the
  // candidate self-join drops exactly the high-df boilerplate items
  // whose posting lists blow up q122's plain inverted-index join — yet
  // the result is provably identical (for any qualifying pair, the
  // globally-heaviest shared item sits in BOTH prefixes). The oracle
  // IS q122's plain all-pairs join — a hash match proves candidate
  // completeness.
  val q235_prefix_weighted_overlap: Q = (s, dir) =>
    graft.dedup.Dedup.prefixFilterWeightedOverlapJoinOn(
      Tables.load(s, dir, "documents"), col("doc_id"),
      graft.text.TextAnalysis.ngrams(
        graft.text.TextAnalysis.tokens(col("text")), 3),
      minWeight = WoMinWeight)
      .orderBy("id_a", "id_b")

  // Deliberately the SAME text as q122_sql (both select from the shared
  // materialized `pairs` CTE): the prefix filter must reproduce the
  // plain join exactly — completeness is the whole claim.
  val q235_sql: String = q122_sql

  // --------------------------------------------------------------- q238
  // Weighted-overlap census over the PREFIX-FILTERED exact join — the
  // count-first scale path (q222) re-based on q235's candidate scheme,
  // so the census stops paying the plain join's hot-posting-list
  // aggregation spill. Because the prefix join is provably identical
  // to the plain join, the census is too: the oracle IS q222's own SQL
  // (same shared pairs CTE) — a hash match proves the whole composed
  // path end to end.
  val q238_prefix_overlap_census: Q = (s, dir) =>
    graft.dedup.Dedup.prefixFilterWeightedOverlapCensus(
      Tables.load(s, dir, "documents"), col("doc_id"),
      graft.text.TextAnalysis.ngrams(
        graft.text.TextAnalysis.tokens(col("text")), 3),
      minWeight = WoMinWeight)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  val q238_sql: String = q222_sql

  // --------------------------------------------------------------- q123
  // Character-class entropy per source: the gibberish / binary-noise
  // detector. Five exact BIGINT class counts from one aggregate; the
  // entropy folds five terms in pinned literal order, 6dp.
  val q123_char_entropy: Q = (s, dir) =>
    graft.text.TextAnalysis.charClassEntropy(
      Tables.load(s, dir, "documents"), col("source"), col("text"))
      .withColumnRenamed("grp", "source")
      .orderBy("source")

  val q123_sql: String = {
    def cnt(pat: String, name: String) =
      s"sum(length(regexp_replace(text, '$pat', '', 'g'))) AS $name"
    def term(c: String) =
      s"(CASE WHEN $c > 0 THEN -(CAST($c AS DOUBLE) / n_chars) * log2(CAST($c AS DOUBLE) / n_chars) ELSE 0.0 END)"
    s"""WITH c AS (SELECT source,
       |    ${cnt("[^a-z]", "n_lower")}, ${cnt("[^A-Z]", "n_upper")},
       |    ${cnt("[^0-9]", "n_digit")}, ${cnt("[^ \\t\\n]", "n_space")},
       |    ${cnt("[a-zA-Z0-9 \\t\\n]", "n_other")}
       |  FROM documents GROUP BY source),
       |t AS (SELECT source,
       |        CAST(n_lower + n_upper + n_digit + n_space + n_other AS BIGINT)
       |          AS n_chars,
       |        n_lower, n_upper, n_digit, n_space, n_other
       |      FROM c)
       |SELECT source, n_chars,
       |  round(${term("n_lower")} + ${term("n_upper")} + ${term("n_digit")}
       |        + ${term("n_space")} + ${term("n_other")}, 6) AS h_bits
       |FROM t ORDER BY source""".stripMargin
  }

  // --------------------------------------------------------------- q124
  // Winnowing (MOSS) candidate pairs: per doc keep each 4-window's
  // minimum 3-shingle md5 hash (~2/(w+1) of shingles stored), then
  // pair docs sharing ≥2 selected fingerprints — the partial-dup
  // detector whose guarantee covers any shared run of ≥ 6 tokens.
  val WinShingle = 3
  val WinWindow = 4
  val WinMinShared = 2

  val q124_winnow_candidates: Q = (s, dir) => {
    // hash array materialized in its own projection BEFORE the winnow
    // HOF — see winnowFromHashes' scaladoc for the 6x trap this avoids
    val fps = Tables.load(s, dir, "documents")
      .select(col("doc_id"), graft.dedup.Dedup
        .shingleHashes32Md5(col("text"), WinShingle).as("__hs"))
      .select(col("doc_id"),
        explode(graft.text.TextAnalysis.winnowFromHashes(
          col("__hs"), WinWindow)).as("fp"))
      .distinct()
    fps.alias("a")
      .join(fps.alias("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinMinShared)
      .orderBy("id_a", "id_b")
  }

  val q124_sql: String =
    s"""WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |             FROM documents),
       |h AS (SELECT doc_id, list_transform(
       |        list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
       |                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
       |        g -> CAST('0x' || substr(md5(g), 1, 8) AS BIGINT)) AS hs FROM tok),
       |wn AS (SELECT doc_id, UNNEST(list_transform(
       |         generate_series(1, greatest(len(hs) - ${WinWindow - 1}, 1)),
       |         i -> list_min(hs[i:i + ${WinWindow - 1}]))) AS fp
       |       FROM h WHERE len(hs) > 0),
       |fps AS (SELECT DISTINCT doc_id, fp FROM wn)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(count(*) AS BIGINT) AS n_shared
       |FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= $WinMinShared
       |ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------------------- q125
  // Quality-aware canonical selection: per duplicate cluster (q81's
  // MinHash components) keep the member with the HIGHEST q112 quality
  // score, not the arbitrary min-id member — singletons survive as
  // their own component. "Dedup keeps the best copy."
  val q125_quality_canonical: Q = (s, dir) => {
    import graft.dedup.Dedup
    val model = graft.ml.Logit.Model(
      Seq("n_tokens", "avg_token_len", "stopword_ratio", "punct_ratio"),
      Array(Curation.QwNTokens, Curation.QwAvgLen, Curation.QwStopword,
        Curation.QwPunct), Curation.QwIntercept)
    val scored = graft.text.TextAnalysis
      .qualityFeatures(Tables.load(s, dir, "documents"), col("text"))
      .select(col("doc_id"), round(model.scoreExpr, 6).as("qscore"))
    val pairs = Dedup.minhashNearDups(TextSim.cappedDocs(s, dir),
      col("doc_id"), col("text"), threshold = 0.8,
      shingleHasher = Dedup.shingleHashes32Md5)
    Dedup.keepBestByScore(scored, col("doc_id"), pairs, col("qscore"))
      .select(col("component"), col("doc_id").as("kept_id"),
        col("qscore"), col("cluster_size"))
      .orderBy("component")
  }

  val q125_sql: String =
    s"""WITH comp AS MATERIALIZED (${TextSim.q81_sql}),
       |q AS MATERIALIZED (${Curation.q112_sql}),
       |r AS (SELECT q.doc_id, coalesce(c.component, q.doc_id) AS component,
       |        q.qscore
       |      FROM q LEFT JOIN comp c ON c.id = q.doc_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY component
       |           ORDER BY qscore DESC, doc_id) AS rn,
       |         count(*) OVER (PARTITION BY component) AS cluster_size
       |       FROM r)
       |SELECT component, doc_id AS kept_id, qscore,
       |  CAST(cluster_size AS BIGINT) AS cluster_size
       |FROM rk WHERE rn = 1 ORDER BY component""".stripMargin

  // --------------------------------------------------------------- q169
  // Quality-aware canonical selection UNCAPPED: q125's keep-best
  // composed with q92's full-corpus MinHash banding instead of the
  // PairDocCap demo window — clusters come from candidate components
  // over the ENTIRE documents table, so the "dedup keeps the best
  // copy" path is hash-checked at whatever corpus size the driver
  // runs (the q155/q162 discipline applied to canonical selection).
  // Everything after the banding is component-count-sized; the
  // keep-best window partitions per duplicate component, whose size
  // the banding's occupancy caps bound.
  val q169_quality_canonical_full: Q = (s, dir) => {
    import graft.dedup.Dedup
    val docs = Tables.load(s, dir, "documents")
    val model = graft.ml.Logit.Model(
      Seq("n_tokens", "avg_token_len", "stopword_ratio", "punct_ratio"),
      Array(Curation.QwNTokens, Curation.QwAvgLen, Curation.QwStopword,
        Curation.QwPunct), Curation.QwIntercept)
    val scored = graft.text.TextAnalysis
      .qualityFeatures(docs, col("text"))
      .select(col("doc_id"), round(model.scoreExpr, 6).as("qscore"))
    val pairs = Dedup.minhashCandidates(docs, col("doc_id"), col("text"),
      shingleHasher = Dedup.shingleHashes32Md5)
    Dedup.keepBestByScore(scored, col("doc_id"), pairs, col("qscore"))
      .select(col("component"), col("doc_id").as("kept_id"),
        col("qscore"), col("cluster_size"))
      .orderBy("component")
  }

  val q169_sql: String = {
    // same 8 unrolled min-label rounds as q81, over the uncapped q92
    // candidate pairs (AS MATERIALIZED: each step reads the previous
    // level twice — default inlining would exponentiate the pipeline)
    val steps = (1 to 8).map { k =>
      s"""l$k AS MATERIALIZED (SELECT n.id, least(n.l, coalesce(min(lu.l), n.l)) AS l
         |  FROM l${k - 1} n
         |  LEFT JOIN adj a ON a.v = n.id
         |  LEFT JOIN l${k - 1} lu ON lu.id = a.u
         |  GROUP BY n.id, n.l)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS MATERIALIZED (${TextSim.q92_sql}),
       |adj AS MATERIALIZED (SELECT id_a AS v, id_b AS u FROM pairs
       |        UNION ALL SELECT id_b, id_a FROM pairs),
       |l0 AS MATERIALIZED (SELECT DISTINCT v AS id, v AS l FROM adj),
       |$steps,
       |comp AS (SELECT id, l AS component FROM l8),
       |q AS MATERIALIZED (${Curation.q112_sql}),
       |r AS (SELECT q.doc_id, coalesce(c.component, q.doc_id) AS component,
       |        q.qscore
       |      FROM q LEFT JOIN comp c ON c.id = q.doc_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY component
       |           ORDER BY qscore DESC, doc_id) AS rn,
       |         count(*) OVER (PARTITION BY component) AS cluster_size
       |       FROM r)
       |SELECT component, doc_id AS kept_id, qscore,
       |  CAST(cluster_size AS BIGINT) AS cluster_size
       |FROM rk WHERE rn = 1 ORDER BY component""".stripMargin
  }

  // --------------------------------------------------------------- q185
  // Leakage-free split assignment: the CONSTRUCTIVE counterpart of the
  // q139 leakage audit — every document inherits the train/holdout
  // split of its duplicate component (uncapped q92 banding → q81's
  // 8-round min-label propagation), so no near-dup pair can straddle
  // the boundary by construction. Membership is the md5 bucket of the
  // component label: reproducible across reruns and engines, 10%
  // holdout in expectation (component-level, so clustered docs move
  // together).
  val SplitHoldoutFrac = 0.1

  val q185_component_split: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val pairs = graft.dedup.Dedup.minhashCandidates(docs, col("doc_id"),
      col("text"), shingleHasher = graft.dedup.Dedup.shingleHashes32Md5)
    graft.operators.Sampling
      .componentSplit(docs, "doc_id", pairs, SplitHoldoutFrac)
      .orderBy("doc_id")
  }

  /** Shared CTE chain ending in `r` = (doc_id, component): q81's 8
    * unrolled min-label rounds over the uncapped q92 pairs, every doc
    * labeled (singletons get their own id). AS MATERIALIZED: each step
    * reads the previous level twice. q185 buckets it into splits; q203
    * weights docs by component size. */
  private def componentCtes: String = {
    val steps = (1 to 8).map { k =>
      s"""l$k AS MATERIALIZED (SELECT n.id, least(n.l, coalesce(min(lu.l), n.l)) AS l
         |  FROM l${k - 1} n
         |  LEFT JOIN adj a ON a.v = n.id
         |  LEFT JOIN l${k - 1} lu ON lu.id = a.u
         |  GROUP BY n.id, n.l)""".stripMargin
    }.mkString(",\n")
    s"""pairs AS MATERIALIZED (${TextSim.q92_sql}),
       |adj AS MATERIALIZED (SELECT id_a AS v, id_b AS u FROM pairs
       |        UNION ALL SELECT id_b, id_a FROM pairs),
       |l0 AS MATERIALIZED (SELECT DISTINCT v AS id, v AS l FROM adj),
       |$steps,
       |comp AS (SELECT id, l AS component FROM l8),
       |r AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
       |      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)""".stripMargin
  }

  val q185_sql: String =
    "WITH " + componentCtes + ",\n" +
      s"""b AS (SELECT doc_id, component,
       |        CAST('0x' || substr(md5(concat_ws('|', component, '42')), 1, 8)
       |          AS BIGINT) % 1000000 AS bucket
       |      FROM r)
       |SELECT doc_id, component,
       |  CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size,
       |  CASE WHEN bucket < ${(SplitHoldoutFrac * 1000000).toLong}
       |       THEN 'holdout' ELSE 'train' END AS split
       |FROM b ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q203
  // Duplicate-aware loss weighting: every document's sampling/loss
  // weight is 1/|its duplicate component| — the corrective that makes
  // a corpus with duplicates train as if deduplicated WITHOUT dropping
  // any copy (the soft alternative to canonical-keep: repeated content
  // contributes one document's worth of gradient, spread across its
  // copies). Same uncapped banding + 8-round propagation as q185;
  // weights are exact integer micro-units (1e6 div size), so Σweight
  // over a component is ~1e6 and the corpus' effective size replays
  // exactly.
  val q203_dedup_weights: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val pairs = graft.dedup.Dedup.minhashCandidates(docs, col("doc_id"),
      col("text"), shingleHasher = graft.dedup.Dedup.shingleHashes32Md5)
    val comp = graft.dedup.Dedup.connectedComponents(pairs, iters = 8)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
    docs.select(col("doc_id"))
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("weight_micro",
        expr("CAST(1000000 AS BIGINT) div cluster_size"))
      .orderBy("doc_id")
  }

  val q203_sql: String =
    "WITH " + componentCtes + "\n" +
      """SELECT doc_id, component,
      |  CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size,
      |  1000000 // CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
      |    AS weight_micro
      |FROM r ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q190
  // Per-source dataset report card — the "datasheet" table a corpus
  // ships with: doc/token mass, mean quality score, gate pass rate,
  // exact-duplicate rate, dominant language. Composes four
  // individually hash-matched pipelines (q112 scoring, q161 gates,
  // q27 fingerprints, q34 language-ID) into one sources-sized frame;
  // every ratio goes through exact integer sums (micronized qscore,
  // BIGINT `div`) so the card replays bit-for-bit.
  val q190_source_report_card: Q = (s, dir) => {
    import graft.text.TextAnalysis
    val docs = Tables.load(s, dir, "documents")
    val model = graft.ml.Logit.Model(
      Seq("n_tokens", "avg_token_len", "stopword_ratio", "punct_ratio"),
      Array(Curation.QwNTokens, Curation.QwAvgLen, Curation.QwStopword,
        Curation.QwPunct), Curation.QwIntercept)
    val f = TextAnalysis.qualityFeatures(docs, col("text"))
    val lenOk = col("n_tokens") >= 30 && col("n_tokens") <= 10000
    val wordOk = col("avg_token_len") >= 2.0 && col("avg_token_len") <= 12.0
    val stopOk = col("stopword_ratio") >= 0.01
    val punctOk = col("punct_ratio") <= 0.2
    val perDoc = f.select(col("doc_id"), col("source"),
      col("n_tokens").cast("long").as("n_tok"),
      round(model.scoreExpr, 6).as("qscore"),
      (lenOk && wordOk && stopOk && punctOk).as("pass"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.langId(col("text")).as("lang"))
    val fpc = perDoc.groupBy("fp").agg(count(lit(1)).as("fpc"))
    val d = perDoc.join(fpc, "fp")
    val base = d.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tok").as("total_tokens"),
      sum(round(col("qscore") * lit(1e6)).cast("long")).as("sq"),
      sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
      sum(when(col("fpc") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
    val lc = perDoc.groupBy("source", "lang").agg(count(lit(1)).as("lcnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("lcnt").desc, col("lang"))
    val topLang = lc.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("lcnt").as("top_lang_docs"))
    base.join(topLang, "source")
      .select(col("source"), col("n_docs"), col("total_tokens"),
        round(col("sq").cast("double") / lit(1e6) / col("n_docs"), 6)
          .as("mean_qscore"),
        expr("n_pass * 1000000L div n_docs").as("pass_micro"),
        expr("n_dup_docs * 1000000L div n_docs").as("dup_micro"),
        col("top_lang"), col("top_lang_docs"))
      .orderBy("source")
  }

  lazy val q190_sql: String = {
    val stop = graft.text.TextAnalysis.defaultStopwords
      .map(w => s"'$w'").mkString(", ")
    val z = s"((((${Curation.QwIntercept} + n_tokens * ${Curation.QwNTokens})" +
      s" + avg_token_len * ${Curation.QwAvgLen})" +
      s" + stopword_ratio * ${Curation.QwStopword})" +
      s" + punct_ratio * ${Curation.QwPunct})"
    s"""WITH f AS (SELECT doc_id, source, text,
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
       |pd AS (SELECT doc_id, source, n_tokens,
       |    round(1.0 / (1.0 + exp(-$z)), 6) AS qscore,
       |    n_tokens >= 30 AND n_tokens <= 10000
       |      AND avg_token_len >= 2.0 AND avg_token_len <= 12.0
       |      AND stopword_ratio >= 0.01 AND punct_ratio <= 0.2 AS pass,
       |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
       |  FROM f),
       |pl AS (${TextSim.q34_sql}),
       |fpc AS (SELECT fp, count(*) AS fpc FROM pd GROUP BY 1),
       |d AS (SELECT pd.doc_id, pd.source, pd.n_tokens, pd.qscore, pd.pass,
       |        fpc.fpc, pl.pred_lang AS lang
       |      FROM pd JOIN fpc USING (fp) JOIN pl USING (doc_id)),
       |base AS (SELECT source, count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |    CAST(sum(CAST(round(qscore * 1000000.0) AS BIGINT)) AS BIGINT) AS sq,
       |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |    CAST(sum(CASE WHEN fpc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
       |  FROM d GROUP BY 1),
       |lc AS (SELECT source, lang, count(*) AS lcnt FROM d GROUP BY 1, 2),
       |tl AS (SELECT source, lang AS top_lang, lcnt AS top_lang_docs,
       |         row_number() OVER (PARTITION BY source
       |           ORDER BY lcnt DESC, lang) AS rn
       |       FROM lc)
       |SELECT b.source, CAST(b.n_docs AS BIGINT) AS n_docs, b.total_tokens,
       |  round(CAST(b.sq AS DOUBLE) / 1000000.0 / b.n_docs, 6) AS mean_qscore,
       |  b.n_pass * 1000000 // b.n_docs AS pass_micro,
       |  b.n_dup_docs * 1000000 // b.n_docs AS dup_micro,
       |  t.top_lang, CAST(t.top_lang_docs AS BIGINT) AS top_lang_docs
       |FROM base b JOIN tl t ON t.source = b.source AND t.rn = 1
       |ORDER BY b.source""".stripMargin
  }

  // --------------------------------------------------------------- q192
  // Water-filling mixture allocation: cap every source's token
  // contribution at a common water level λ chosen so the total fills
  // 90% of the corpus — the hard-cap mixture allocator (complement of
  // q121's √-temperature reweighting: this one funds small sources in
  // FULL and shaves only the dominant ones). λ comes from the
  // supply-ascending prefix sums in closed integer form, so the whole
  // allocation replays exactly.
  val q192_waterfill_mixture: Q = (s, dir) => {
    import graft.text.TextAnalysis
    val docs = Tables.load(s, dir, "documents")
    val supplies = docs.select(col("source"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
    graft.operators.Sampling.waterfillByFraction(
      supplies, col("source"), col("n_tok"), 9, 10)
  }

  val q192_sql: String =
    """WITH c AS (SELECT source AS domain,
      |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
      |      AS supply
      |  FROM documents GROUP BY 1),
      |b AS (SELECT CAST(sum(supply) AS BIGINT) * 9 // 10 AS t,
      |        CAST(sum(supply) AS BIGINT) AS tot, count(*) AS n_g
      |      FROM c),
      |r AS (SELECT domain, supply,
      |        CAST(sum(supply) OVER (ORDER BY supply, domain
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |          AS p,
      |        row_number() OVER (ORDER BY supply, domain) AS i
      |      FROM c),
      |cand AS (SELECT (b.t - (r.p - r.supply)) // (b.n_g - r.i + 1) AS lambda,
      |           r.i
      |         FROM r CROSS JOIN b
      |         WHERE b.tot > b.t
      |           AND (r.p - r.supply) + r.supply * (b.n_g - r.i + 1) >= b.t),
      |lam AS (SELECT min_by(lambda, i) AS water_level FROM cand)
      |SELECT c.domain, c.supply,
      |  CASE WHEN l.water_level IS NULL THEN c.supply
      |       ELSE least(c.supply, l.water_level) END AS alloc,
      |  CASE WHEN l.water_level IS NULL THEN FALSE
      |       ELSE c.supply > l.water_level END AS capped
      |FROM c CROSS JOIN lam l ORDER BY c.domain""".stripMargin

  // --------------------------------------------------------------- q197
  // DoReMi-style domain reweighting: one deterministic
  // multiplicative-weights step over per-domain EXCESS LOSS — bits the
  // corpus-wide generalist bigram LM pays over each domain's own
  // specialist LM. Complements q121 (√-temperature) and q192
  // (water-filling): those reshape by SIZE alone; this one funds
  // domains by how much distributional mass the shared model is
  // leaving on the table (the Group-DRO signal). All losses are
  // micro-unit BIGINTs; the one exp() per domain re-pins to integers
  // before the normalizing sum.
  val DoremiEta = 1.0

  val q197_doremi_weights: Q = (s, dir) =>
    graft.text.LangModel.domainExcessWeights(
      Tables.load(s, dir, "documents"),
      col("doc_id"), col("text"), col("source"), DoremiEta)

  val q197_sql: String =
    s"""WITH a AS (SELECT doc_id, source AS domain,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
       |  FROM documents),
       |o AS (SELECT doc_id, domain, gram, split_part(gram, ' ', 1) AS w1 FROM (
       |    SELECT doc_id, domain, UNNEST(list_transform(
       |        generate_series(1, greatest(len(toks) - 1, 0)),
       |        i -> toks[i] || ' ' || toks[i + 1])) AS gram FROM a)),
       |c12 AS (SELECT gram, w1, count(*) AS c12 FROM o GROUP BY 1, 2),
       |c1 AS (SELECT w1, count(*) AS c1 FROM o GROUP BY 1),
       |v AS (SELECT count(DISTINCT tok) AS v
       |      FROM (SELECT UNNEST(toks) AS tok FROM a)),
       |lmg AS (SELECT gram, CAST(round(log2(
       |      (CAST(c12 AS DOUBLE) + 0.5)
       |      / (CAST(c1 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)))
       |    * 1000000.0, 0) AS BIGINT) AS lpg
       |  FROM c12 JOIN c1 USING (w1) CROSS JOIN v),
       |c12d AS (SELECT domain, gram, w1, count(*) AS c12 FROM o GROUP BY 1, 2, 3),
       |c1d AS (SELECT domain, w1, count(*) AS c1 FROM o GROUP BY 1, 2),
       |vd AS (SELECT domain, count(DISTINCT tok) AS v
       |       FROM (SELECT domain, UNNEST(toks) AS tok FROM a) GROUP BY 1),
       |lmd AS (SELECT domain, gram, CAST(round(log2(
       |      (CAST(c12 AS DOUBLE) + 0.5)
       |      / (CAST(c1 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)))
       |    * 1000000.0, 0) AS BIGINT) AS lpd
       |  FROM c12d JOIN c1d USING (domain, w1) JOIN vd USING (domain)),
       |pd AS (SELECT domain, doc_id, count(*) AS nb,
       |         sum(lpg) AS sg, sum(lpd) AS sd
       |       FROM o JOIN lmg USING (gram) JOIN lmd USING (domain, gram)
       |       GROUP BY 1, 2),
       |dm AS (SELECT domain, count(*) AS n_docs,
       |         CAST(sum(nb) AS BIGINT) AS bigram_mass,
       |         CAST(sum(sg) AS BIGINT) AS sgt, CAST(sum(sd) AS BIGINT) AS sdt
       |       FROM pd GROUP BY 1),
       |e AS (SELECT domain, n_docs, bigram_mass,
       |        greatest(sdt - sgt, 0) // bigram_mass AS excess_micro FROM dm),
       |t AS (SELECT CAST(sum(bigram_mass) AS BIGINT) AS mass_tot FROM e),
       |w AS (SELECT domain, n_docs, bigram_mass, excess_micro,
       |        CAST(bigram_mass AS DOUBLE) / CAST(mass_tot AS DOUBLE) AS base_share,
       |        CAST(round(CAST(bigram_mass AS DOUBLE) / CAST(mass_tot AS DOUBLE)
       |          * exp($DoremiEta * excess_micro / 1000000.0) * 1e12, 0)
       |          AS BIGINT) AS wrm
       |      FROM e CROSS JOIN t),
       |wt AS (SELECT CAST(sum(wrm) AS BIGINT) AS w_tot FROM w)
       |SELECT domain, CAST(n_docs AS BIGINT) AS n_docs, bigram_mass,
       |  CAST(excess_micro AS BIGINT) AS excess_micro,
       |  round(base_share, 6) AS base_share,
       |  round(CAST(wrm AS DOUBLE) / CAST(w_tot AS DOUBLE), 6) AS weight
       |FROM w CROSS JOIN wt ORDER BY domain""".stripMargin

  // --------------------------------------------------------------- q205
  // Preference-pair mining from duplicate clusters: within every
  // near-dup component, the best-quality member becomes `chosen` and
  // the worst becomes `rejected` — near-duplicate content is the
  // closest thing a raw corpus has to "same prompt, different
  // quality", which is exactly the contrast a DPO/reward-model pair
  // needs. Quality = distinct-token ratio in micro-units (the q199
  // signal); ties resolve on doc id (min for chosen, max for
  // rejected), so equal-quality clusters still emit a deterministic
  // pair with margin 0 for the consumer to threshold. Components come
  // from the same uncapped banding + 8-round propagation as
  // q185/q203; everything after the component join is window-per-
  // component, bounded by cluster size.
  val q205_preference_pairs: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val pairs = graft.dedup.Dedup.minhashCandidates(docs, col("doc_id"),
      col("text"), shingleHasher = graft.dedup.Dedup.shingleHashes32Md5)
    val comp = graft.dedup.Dedup.connectedComponents(pairs, iters = 8)
    val tk = split(trim(col("text")), "\\s+")
    val m = docs.select(col("doc_id"),
      size(tk).cast("long").as("n_tok"),
      size(array_distinct(tk)).cast("long").as("n_distinct"))
      .withColumn("q_micro", expr("(n_distinct * 1000000) div n_tok"))
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
    val byComp = org.apache.spark.sql.expressions.Window
      .partitionBy("component")
    val best = m.withColumn("rn", row_number().over(
      byComp.orderBy(col("q_micro").desc, col("doc_id").asc)))
      .filter(col("rn") === 1)
      .select(col("component"), col("doc_id").as("chosen_id"),
        col("q_micro").as("chosen_q"))
    val worst = m.withColumn("rn", row_number().over(
      byComp.orderBy(col("q_micro").asc, col("doc_id").desc)))
      .filter(col("rn") === 1)
      .select(col("component"), col("doc_id").as("rejected_id"),
        col("q_micro").as("rejected_q"))
    best.join(worst, "component")
      .filter(col("chosen_id") =!= col("rejected_id"))
      .select(col("component"), col("chosen_id"), col("rejected_id"),
        col("chosen_q"), col("rejected_q"),
        (col("chosen_q") - col("rejected_q")).as("margin_micro"))
      .orderBy("component")
  }

  val q205_sql: String =
    "WITH " + componentCtes + ",\n" +
      """q AS (SELECT doc_id,
      |    (CAST(len(list_distinct(tk)) AS BIGINT) * 1000000)
      |      // CAST(len(tk) AS BIGINT) AS q_micro
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
      |        FROM documents)),
      |m AS (SELECT c.id AS doc_id, c.component, q.q_micro
      |      FROM comp c JOIN q ON q.doc_id = c.id),
      |b AS (SELECT component, doc_id AS chosen_id, q_micro AS chosen_q,
      |        row_number() OVER (PARTITION BY component
      |          ORDER BY q_micro DESC, doc_id ASC) AS rn FROM m),
      |w AS (SELECT component, doc_id AS rejected_id, q_micro AS rejected_q,
      |        row_number() OVER (PARTITION BY component
      |          ORDER BY q_micro ASC, doc_id DESC) AS rn FROM m)
      |SELECT b.component, b.chosen_id, w.rejected_id,
      |  b.chosen_q, w.rejected_q,
      |  b.chosen_q - w.rejected_q AS margin_micro
      |FROM b JOIN w ON b.component = w.component AND b.rn = 1 AND w.rn = 1
      |WHERE b.chosen_id <> w.rejected_id
      |ORDER BY b.component""".stripMargin

  // --------------------------------------------------------------- q126
  // Rolling count-anomaly census: per event-type hourly counts
  // z-scored against the trailing 24 observed hours (current hour
  // excluded), top-20 |z| — the stream-monitoring primitive. Window
  // sums stay BIGINT-exact; z derives in one pinned expression.
  val AnWindow = 24
  val AnTopK = 20

  val q126_count_anomalies: Q = (s, dir) =>
    graft.analytics.Drift.rollingCountAnomalies(
      Tables.load(s, dir, "events"), col("event_type"),
      date_trunc("hour", col("ts")), AnWindow)
      .select(col("k").as("event_type"),
        date_format(col("b"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("n"), col("z"))
      .orderBy(abs(col("z")).desc, col("event_type"), col("hour"))
      .limit(AnTopK)

  val q126_sql: String =
    s"""WITH hourly AS (SELECT event_type AS k, date_trunc('hour', ts) AS b,
       |                  count(*) AS n
       |                FROM events GROUP BY 1, 2),
       |w AS (SELECT k, b, n, count(*) OVER win AS cnt,
       |        sum(n) OVER win AS sx, sum(n * n) OVER win AS sxx
       |      FROM hourly
       |      WINDOW win AS (PARTITION BY k ORDER BY b
       |                     ROWS BETWEEN $AnWindow PRECEDING AND 1 PRECEDING)),
       |v AS (SELECT k, b, n, sx,
       |        (CAST(sxx AS DOUBLE) * $AnWindow
       |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |          / ($AnWindow.0 * ${AnWindow - 1}) AS var
       |      FROM w WHERE cnt = $AnWindow)
       |SELECT k AS event_type, strftime(b, '%Y-%m-%d %H:%M:%S') AS hour,
       |  CAST(n AS BIGINT) AS n,
       |  round((CAST(n AS DOUBLE) - CAST(sx AS DOUBLE) / $AnWindow.0)
       |        / sqrt(var), 6) AS z
       |FROM v WHERE var > 0
       |ORDER BY abs(round((CAST(n AS DOUBLE) - CAST(sx AS DOUBLE) / $AnWindow.0)
       |        / sqrt(var), 6)) DESC, event_type, hour
       |LIMIT $AnTopK""".stripMargin

  // --------------------------------------------------------------- q127
  // PMI collocations: top-20 word bigrams by pointwise mutual
  // information (min count 5) — the phrase detector for tokenizer
  // vocab curation. Exact BIGINT counts; one log2 + round per row.
  val PmiMinCount = 5L
  val PmiTopK = 20

  val q127_pmi_collocations: Q = (s, dir) =>
    graft.text.Corpus.pmiCollocations(
      Tables.load(s, dir, "documents"), col("text"), PmiMinCount)
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(PmiTopK)

  val q127_sql: String =
    s"""WITH toks AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS t
       |              FROM documents),
       |uni AS (SELECT UNNEST(t) AS w FROM toks),
       |uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
       |tot AS (SELECT sum(c) AS t FROM uc),
       |bg AS (SELECT UNNEST(list_transform(
       |         generate_series(1, greatest(len(t) - 1, 0)),
       |         i -> t[i] || ' ' || t[i+1])) AS bg FROM toks),
       |bc AS (SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
       |         count(*) AS c12
       |       FROM bg GROUP BY 1, 2 HAVING count(*) >= $PmiMinCount)
       |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
       |  CAST(u1.c AS BIGINT) AS c1, CAST(u2.c AS BIGINT) AS c2,
       |  round(log2(CAST(c12 * tot.t AS DOUBLE)
       |             / CAST(u1.c * u2.c AS DOUBLE)), 6) AS pmi
       |FROM bc JOIN uc u1 ON u1.w = bc.w1 JOIN uc u2 ON u2.w = bc.w2, tot
       |ORDER BY pmi DESC, w1, w2 LIMIT $PmiTopK""".stripMargin

  // --------------------------------------------------------------- q128
  // PSI drift between every source pair over document length —
  // completes the drift family (q108 KS: rank-based, q115 chi2:
  // categorical, PSI: the model-monitoring standard). 10 equal-width
  // integer bins, Laplace-smoothed, terms folded in bin order.
  val PsiBins = 10

  val q128_psi_drift: Q = (s, dir) =>
    graft.analytics.Drift.psiPairs(
      Tables.load(s, dir, "documents"), col("source"), col("n_chars"),
      bins = PsiBins)
      .orderBy("grp_a", "grp_b")

  val q128_sql: String =
    s"""WITH cnt AS (SELECT source AS grp, n_chars AS v, count(*) AS c
       |             FROM documents GROUP BY 1, 2),
       |pairs AS (SELECT a.grp AS grp_a, b.grp AS grp_b
       |          FROM (SELECT DISTINCT grp FROM cnt) a,
       |               (SELECT DISTINCT grp FROM cnt) b
       |          WHERE a.grp < b.grp),
       |merged AS (SELECT p.grp_a, p.grp_b, c.v,
       |    sum(CASE WHEN c.grp = p.grp_a THEN c.c ELSE 0 END) AS ca,
       |    sum(CASE WHEN c.grp = p.grp_b THEN c.c ELSE 0 END) AS cb
       |  FROM pairs p JOIN cnt c ON c.grp = p.grp_a OR c.grp = p.grp_b
       |  GROUP BY 1, 2, 3),
       |rng AS (SELECT grp_a, grp_b, min(v) AS mn, max(v) AS mx
       |        FROM merged GROUP BY 1, 2),
       |binned AS (SELECT m.grp_a, m.grp_b,
       |             ((m.v - r.mn) * $PsiBins) // (r.mx - r.mn + 1) AS bin,
       |             sum(ca) AS ca, sum(cb) AS cb
       |           FROM merged m JOIN rng r USING (grp_a, grp_b)
       |           GROUP BY 1, 2, 3),
       |grid AS (SELECT p.grp_a, p.grp_b, g.bin FROM pairs p CROSS JOIN
       |           (SELECT UNNEST(generate_series(0, ${PsiBins - 1})) AS bin) g),
       |filled AS (SELECT g.grp_a, g.grp_b, g.bin,
       |             coalesce(b.ca, 0) AS ca, coalesce(b.cb, 0) AS cb
       |           FROM grid g LEFT JOIN binned b USING (grp_a, grp_b, bin)),
       |tot AS (SELECT grp_a, grp_b, sum(ca) AS n_a, sum(cb) AS n_b
       |        FROM filled GROUP BY 1, 2),
       |terms AS (SELECT f.grp_a, f.grp_b, f.bin, t.n_a, t.n_b,
       |    ((CAST(f.ca + 1 AS DOUBLE) / (t.n_a + $PsiBins))
       |       - (CAST(f.cb + 1 AS DOUBLE) / (t.n_b + $PsiBins)))
       |    * ln((CAST(f.ca + 1 AS DOUBLE) / (t.n_a + $PsiBins))
       |         / (CAST(f.cb + 1 AS DOUBLE) / (t.n_b + $PsiBins))) AS term
       |  FROM filled f JOIN tot t USING (grp_a, grp_b))
       |SELECT grp_a, grp_b, CAST(max(n_a) AS BIGINT) AS n_a,
       |  CAST(max(n_b) AS BIGINT) AS n_b,
       |  round(list_sum(list(term ORDER BY bin)), 6) AS psi
       |FROM terms GROUP BY grp_a, grp_b ORDER BY grp_a, grp_b""".stripMargin

  // --------------------------------------------------------------- q129
  // Label-centroid cosine matrix: class-separation diagnostic over
  // the embeddings table. Integer milli-unit component SUMS (cosine
  // is scale-invariant — no centroid division, whose floor/trunc
  // semantics differ across engines for negative sums); one pinned
  // double expression at the end.
  val q129_centroid_cosine: Q = (s, dir) =>
    graft.similarity.Similarity.centroidCosineMatrix(
      Tables.load(s, dir, "embeddings"), col("label"), col("embedding"))
      .orderBy("label_a", "label_b")

  val q129_sql: String =
    """WITH m AS (SELECT label, UNNEST(generate_series(0, 63)) AS pos, embedding
      |           FROM embeddings),
      |f AS (SELECT label, pos,
      |        CAST(round(CAST(embedding[pos + 1] AS DOUBLE) * 1000.0) AS BIGINT)
      |          AS mv
      |      FROM m),
      |c AS (SELECT label, pos, sum(mv) AS s FROM f GROUP BY 1, 2),
      |p AS (SELECT a.label AS label_a, b.label AS label_b,
      |        sum(a.s * b.s) AS dot, sum(a.s * a.s) AS na, sum(b.s * b.s) AS nb
      |      FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
      |      GROUP BY 1, 2)
      |SELECT label_a, label_b,
      |  round(CAST(dot AS DOUBLE)
      |        / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6)
      |    AS cosine
      |FROM p WHERE na > 0 AND nb > 0
      |ORDER BY label_a, label_b""".stripMargin

  // --------------------------------------------------------------- q130
  // Referential-integrity census over every star-schema FK edge — the
  // dbt-test / DQ layer as one union'd plan: row counts, null FKs,
  // distinct keys, and orphans (non-null FK with no parent) per edge.
  private val FkEdges = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  val q130_fk_audit: Q = (s, dir) => {
    val audits = FkEdges.map { case (ct, fk, pt, pk) =>
      graft.operators.Quality.fkAudit(
        Tables.load(s, dir, ct), ct, col(fk),
        Tables.load(s, dir, pt), pt, col(pk))
    }
    graft.operators.Quality.auditUnion(audits).orderBy("edge")
  }

  val q130_sql: String = {
    def one(ct: String, fk: String, pt: String, pk: String) =
      s"""SELECT '$ct.$fk->$pt' AS edge, count(*) AS n_rows,
         |  count(*) - count($fk) AS n_null_fk,
         |  count(DISTINCT $fk) AS n_distinct,
         |  (SELECT count(*) FROM $ct c WHERE c.$fk IS NOT NULL AND NOT EXISTS
         |     (SELECT 1 FROM $pt p WHERE p.$pk = c.$fk)) AS n_orphans
         |FROM $ct""".stripMargin
    FkEdges.map { case (ct, fk, pt, pk) => one(ct, fk, pt, pk) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY edge")
  }

  // --------------------------------------------------------------- q131
  // Uniqueness census per declared key — the dbt `unique` test kept
  // countable. Deliberately includes lineitem's (l_orderkey,
  // l_linenumber), which the synthetic generator DUPLICATES: the
  // audit's job is to find exactly that.
  private val UniqueKeys = Seq(
    ("region:r_regionkey", "region", Seq("r_regionkey")),
    ("nation:n_nationkey", "nation", Seq("n_nationkey")),
    ("customer:c_custkey", "customer", Seq("c_custkey")),
    ("supplier:s_suppkey", "supplier", Seq("s_suppkey")),
    ("part:p_partkey", "part", Seq("p_partkey")),
    ("orders:o_orderkey", "orders", Seq("o_orderkey")),
    ("lineitem:l_orderkey,l_linenumber", "lineitem",
      Seq("l_orderkey", "l_linenumber")),
    ("events:event_id", "events", Seq("event_id")),
    ("documents:doc_id", "documents", Seq("doc_id")),
    ("embeddings:vec_id", "embeddings", Seq("vec_id")))

  val q131_unique_audit: Q = (s, dir) => {
    val audits = UniqueKeys.map { case (name, t, keys) =>
      graft.operators.Quality.uniqueAudit(
        Tables.load(s, dir, t), name, keys.map(col))
    }
    graft.operators.Quality.auditUnion(audits).orderBy("table_key")
  }

  val q131_sql: String = {
    def one(name: String, t: String, keys: Seq[String]) =
      s"""SELECT '$name' AS table_key, CAST(sum(c) AS BIGINT) AS n_rows,
         |  count(*) AS n_keys, CAST(sum(c) - count(*) AS BIGINT) AS n_surplus,
         |  max(c) AS max_dup
         |FROM (SELECT count(*) AS c FROM $t
         |      GROUP BY ${keys.mkString(", ")})""".stripMargin
    UniqueKeys.map { case (n, t, k) => one(n, t, k) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_key")
  }

  // --------------------------------------------------------------- q132
  // Burstiness census: Fano factor of hourly counts per event type —
  // Poisson-like ≈1, bursty ≫1, over-regular ≪1. Exact BIGINT sums,
  // one pinned double expression.
  val q132_burstiness: Q = (s, dir) =>
    graft.analytics.Drift.burstiness(
      Tables.load(s, dir, "events"), col("event_type"),
      date_trunc("hour", col("ts")))
      .withColumnRenamed("k", "event_type")
      .orderBy("event_type")

  val q132_sql: String =
    """WITH hourly AS (SELECT event_type AS k, date_trunc('hour', ts) AS b,
      |                  count(*) AS c
      |                FROM events GROUP BY 1, 2),
      |agg AS (SELECT k, count(*) AS n_buckets, sum(c) AS sx,
      |          sum(c * c) AS sxx
      |        FROM hourly GROUP BY k)
      |SELECT k AS event_type, CAST(n_buckets AS BIGINT) AS n_buckets,
      |  CAST(sx AS BIGINT) AS n_events,
      |  round(((CAST(sxx AS DOUBLE) * n_buckets
      |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |          / (CAST(n_buckets AS DOUBLE) * (n_buckets - 1)))
      |        / (CAST(sx AS DOUBLE) / CAST(n_buckets AS DOUBLE)), 6) AS fano
      |FROM agg WHERE n_buckets > 1 AND sx > 0
      |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- q133
  // Concentration census: HHI + Gini of the orders-per-customer
  // distribution (1500 groups, counts 1-25 — a real spread; the
  // synthetic documents-per-source split is exactly uniform and would
  // pin only constants). Exact BIGINT Σc²/Σrc, pinned doubles.
  val q133_concentration: Q = (s, dir) =>
    graft.analytics.Drift.concentration(
      Tables.load(s, dir, "orders"), col("o_custkey"))

  val q133_sql: String =
    """WITH counts AS (SELECT o_custkey AS k, count(*) AS c
      |                FROM orders GROUP BY 1),
      |ranked AS (SELECT k, c, row_number() OVER (ORDER BY c, k) AS r
      |           FROM counts),
      |agg AS (SELECT count(*) AS n_groups, sum(c) AS n_rows,
      |          sum(c * c) AS sum_c2, sum(r * c) AS sum_rc
      |        FROM ranked)
      |SELECT CAST(n_groups AS BIGINT) AS n_groups,
      |  CAST(n_rows AS BIGINT) AS n_rows,
      |  round(CAST(sum_c2 AS DOUBLE)
      |        / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)), 6) AS hhi,
      |  round((2.0 * CAST(sum_rc AS DOUBLE)
      |          - CAST(n_groups + 1 AS DOUBLE) * CAST(n_rows AS DOUBLE))
      |        / (CAST(n_groups AS DOUBLE) * CAST(n_rows AS DOUBLE)), 6) AS gini
      |FROM agg""".stripMargin

  // --------------------------------------------------------------- q134
  // Per-source unigram entropy: corpus-diversity gauge — repetitive/
  // templated sources score far below the uniform bound log2(n_types).
  // Each c·log2(c) term rounds to a micro-unit BIGINT before the sum,
  // so the accumulation is exact and order-free across engines.
  val q134_entropy: Q = (s, dir) =>
    graft.text.Corpus.unigramEntropy(
      Tables.load(s, dir, "documents"), col("source"), col("text"))
      .withColumnRenamed("g", "source")
      .orderBy("source")

  val q134_sql: String =
    """WITH t AS (SELECT source AS g,
      |             UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token
      |           FROM documents),
      |c AS (SELECT g, token, count(*) AS c FROM t GROUP BY 1, 2),
      |s AS (SELECT g, count(*) AS n_types, sum(c) AS n_tokens,
      |        sum(CAST(round(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))
      |                       * 1000000.0) AS BIGINT)) AS sterm
      |      FROM c GROUP BY g)
      |SELECT g AS source, CAST(n_types AS BIGINT) AS n_types,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  round(log2(CAST(n_tokens AS DOUBLE))
      |        - CAST(sterm AS DOUBLE)
      |          / (CAST(n_tokens AS DOUBLE) * 1000000.0), 6) AS entropy_bits
      |FROM s ORDER BY source""".stripMargin

  // --------------------------------------------------------------- q135
  // Per-source Zipf rank-frequency slope: OLS of ln(count) on
  // ln(rank) over the top-ranked types. Natural text ~ -1; templated
  // sources flatten toward 0. Ranks use a total (count DESC, token)
  // order; each OLS term rounds to a micro-unit BIGINT before the
  // sum; the closed-form slope is fixed scalar math over exact sums.
  val q135_zipf: Q = (s, dir) =>
    graft.text.Corpus.zipfSlope(
      Tables.load(s, dir, "documents"), col("source"), col("text"))
      .withColumnRenamed("g", "source")
      .orderBy("source")

  val q135_sql: String =
    """WITH t AS (SELECT source AS g,
      |             UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token
      |           FROM documents),
      |c AS (SELECT g, token, count(*) AS c FROM t GROUP BY 1, 2),
      |r AS (SELECT g, c,
      |        row_number() OVER (PARTITION BY g
      |                           ORDER BY c DESC, token) AS rank
      |      FROM c),
      |terms AS (SELECT g,
      |    CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000.0) AS BIGINT) AS tx,
      |    CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS ty,
      |    CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))
      |               * 1000000.0) AS BIGINT) AS txx,
      |    CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(c AS DOUBLE))
      |               * 1000000.0) AS BIGINT) AS txy
      |  FROM r WHERE rank <= 1000),
      |agg AS (SELECT g, count(*) AS n, sum(tx) AS sx, sum(ty) AS sy,
      |          sum(txx) AS sxx, sum(txy) AS sxy
      |        FROM terms GROUP BY g HAVING count(*) >= 2)
      |SELECT g AS source, CAST(n AS BIGINT) AS n_types_used,
      |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) * 1000000.0
      |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) * 1000000.0
      |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope
      |FROM agg ORDER BY source""".stripMargin

  // --------------------------------------------------------------- q136
  // Cohen's kappa between the two keep/drop raters the pipeline
  // already runs: q77's rule gate and q112's pinned-weight logistic
  // classifier. One conditional-count aggregate (exact BIGINTs, one
  // pass); agreement/chance/kappa are fixed scalar math over the
  // counts. Undefined kappa (both raters constant) surfaces as null.
  val q136_rater_kappa: Q = (s, dir) => {
    val f = graft.text.TextAnalysis.qualityFeatures(
      Tables.load(s, dir, "documents"), col("text"))
    val model = graft.ml.Logit.Model(
      Seq("n_tokens", "avg_token_len", "stopword_ratio", "punct_ratio"),
      Array(Curation.QwNTokens, Curation.QwAvgLen, Curation.QwStopword,
        Curation.QwPunct), Curation.QwIntercept)
    val rated = f.select(
      (col("n_tokens") >= 30 && col("n_tokens") <= 10000 &&
        col("avg_token_len") >= 2.0 && col("avg_token_len") <= 12.0 &&
        col("stopword_ratio") >= 0.01 && col("punct_ratio") <= 0.2)
        .as("gate_keep"),
      (model.scoreExpr >= 0.5).as("clf_keep"))
    graft.ml.Eval.kappa(rated, col("gate_keep"), col("clf_keep"))
  }

  val q136_sql: String = {
    val stop = graft.text.TextAnalysis.defaultStopwords
      .map(w => s"'$w'").mkString(", ")
    val z = s"((((${Curation.QwIntercept} + n_tokens * ${Curation.QwNTokens})" +
      s" + avg_token_len * ${Curation.QwAvgLen})" +
      s" + stopword_ratio * ${Curation.QwStopword})" +
      s" + punct_ratio * ${Curation.QwPunct})"
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
       |  FROM documents),
       |r AS (SELECT
       |    (n_tokens >= 30 AND n_tokens <= 10000
       |      AND avg_token_len >= 2.0 AND avg_token_len <= 12.0
       |      AND stopword_ratio >= 0.01 AND punct_ratio <= 0.2) AS ga,
       |    (1.0 / (1.0 + exp(-$z)) >= 0.5) AS cb
       |  FROM f),
       |c AS (SELECT
       |    CAST(sum(CASE WHEN ga IS NOT NULL AND cb IS NOT NULL
       |             THEN 1 ELSE 0 END) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN ga IS NULL OR cb IS NULL
       |             THEN 1 ELSE 0 END) AS BIGINT) AS n_excluded,
       |    CAST(sum(CASE WHEN ga AND cb THEN 1 ELSE 0 END) AS BIGINT) AS n11,
       |    CAST(sum(CASE WHEN ga AND NOT cb THEN 1 ELSE 0 END) AS BIGINT) AS n10,
       |    CAST(sum(CASE WHEN NOT ga AND cb THEN 1 ELSE 0 END) AS BIGINT) AS n01,
       |    CAST(sum(CASE WHEN NOT ga AND NOT cb THEN 1 ELSE 0 END) AS BIGINT) AS n00
       |  FROM r)
       |SELECT n, n_excluded, n11, n10, n01, n00,
       |  round(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS agreement,
       |  round((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
       |          + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
       |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS chance_agreement,
       |  CASE WHEN (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
       |              + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
       |            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0
       |    THEN round((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
       |                 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
       |                     + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
       |                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
       |               / (1.0 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
       |                          + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
       |                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
       |    ELSE NULL END AS kappa
       |FROM c""".stripMargin
  }

  // --------------------------------------------------------------- q137
  // Pairwise Jensen-Shannon divergence between source unigram
  // distributions: the token-side drift matrix (q127's PSI covers the
  // numeric side). Inner-join-only decomposition — one-sided tokens
  // contribute exactly p/2, recovered from exact BIGINT mass sums.
  val q137_jsd_matrix: Q = (s, dir) =>
    graft.text.Corpus.unigramJsd(
      Tables.load(s, dir, "documents"), col("source"), col("text"))
      .withColumnRenamed("g_a", "source_a")
      .withColumnRenamed("g_b", "source_b")
      .orderBy("source_a", "source_b")

  val q137_sql: String = {
    val p = "(CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE))"
    val q = "(CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE))"
    s"""WITH t AS (SELECT source AS g,
       |             UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS token
       |           FROM documents),
       |c AS (SELECT g, token, count(*) AS c FROM t GROUP BY 1, 2),
       |tot AS (SELECT g, sum(c) AS t FROM c GROUP BY g),
       |w AS (SELECT c.g, c.token, c.c, tot.t FROM c JOIN tot ON c.g = tot.g),
       |sh AS (SELECT a.g AS g_a, b.g AS g_b, count(*) AS n_shared,
       |         sum(a.c) AS sca, sum(b.c) AS scb,
       |         sum(CAST(round(($p * log2(2.0 * $p / ($p + $q))
       |                         + $q * log2(2.0 * $q / ($p + $q))) * 0.5
       |                        * 1000000.0) AS BIGINT)) AS sterm
       |       FROM w a JOIN w b ON a.token = b.token AND a.g < b.g
       |       GROUP BY 1, 2),
       |pairs AS (SELECT ta.g AS g_a, ta.t AS ta, tb.g AS g_b, tb.t AS tb
       |          FROM tot ta, tot tb WHERE ta.g < tb.g)
       |SELECT p.g_a AS source_a, p.g_b AS source_b,
       |  CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared_types,
       |  round(CAST(coalesce(sterm, 0) AS DOUBLE) / 1000000.0
       |        + 0.5 * (1.0 - CAST(coalesce(sca, 0) AS DOUBLE)
       |                       / CAST(p.ta AS DOUBLE))
       |        + 0.5 * (1.0 - CAST(coalesce(scb, 0) AS DOUBLE)
       |                       / CAST(p.tb AS DOUBLE)), 6) AS jsd_bits
       |FROM pairs p LEFT JOIN sh ON p.g_a = sh.g_a AND p.g_b = sh.g_b
       |ORDER BY p.g_a, p.g_b""".stripMargin
  }

  // --------------------------------------------------------------- q138
  // Benchmark decontamination CENSUS: per-document fraction of word
  // 3-grams shared with a held-out eval set (src0 stands in for the
  // benchmark) — the thresholded-removal primitive on top of q101's
  // any-hit report. Eval grams broadcast; corpus grams dedup per row
  // before the explode; only contaminated grams reach the shuffle.
  val q138_decontaminate: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    graft.text.Decontam.contaminationCensus(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"), 3)
      .orderBy("doc_id")
  }

  val q138_sql: String =
    """WITH ev AS (SELECT DISTINCT UNNEST(list_transform(
      |      generate_series(1, greatest(len(toks) - 2, 0)),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
      |    FROM (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |          FROM documents WHERE source = 'src0')),
      |cg AS (SELECT doc_id, len(grams) AS n_grams, UNNEST(grams) AS gram
      |    FROM (SELECT doc_id, list_distinct(list_transform(
      |        generate_series(1, greatest(len(toks) - 2, 0)),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS grams
      |      FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |            FROM documents WHERE source <> 'src0')))
      |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
      |  CAST(count(*) AS BIGINT) AS n_hit_grams,
      |  round(CAST(count(*) AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS hit_frac
      |FROM cg JOIN ev USING (gram)
      |GROUP BY doc_id, n_grams ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- q144/q145
  // Threshold-free and calibration evals of the q112 classifier
  // against the q77 rule gate (the rater pair q136's kappa compares at
  // one fixed cut): q144 ranks every document by the continuous
  // sigmoid score and computes exact tie-averaged Mann-Whitney AUC;
  // q145 buckets the claimed probabilities into 10 reliability bins
  // and reports mean-predicted vs empirical keep rate per bin.

  /** Shared (score, gate-label) relation for q144/q145: the q112
    * 6dp sigmoid score and the q136 rule-gate boolean. */
  private def scoredVsGate(s: SparkSession, dir: String): DataFrame = {
    val f = graft.text.TextAnalysis.qualityFeatures(
      Tables.load(s, dir, "documents"), col("text"))
    val model = graft.ml.Logit.Model(
      Seq("n_tokens", "avg_token_len", "stopword_ratio", "punct_ratio"),
      Array(Curation.QwNTokens, Curation.QwAvgLen, Curation.QwStopword,
        Curation.QwPunct), Curation.QwIntercept)
    f.select(round(model.scoreExpr, 6).as("qscore"),
      (col("n_tokens") >= 30 && col("n_tokens") <= 10000 &&
        col("avg_token_len") >= 2.0 && col("avg_token_len") <= 12.0 &&
        col("stopword_ratio") >= 0.01 && col("punct_ratio") <= 0.2)
        .as("gate_keep"))
  }

  /** Shared DuckDB CTEs producing the same (s = score, y = gate)
    * relation, both non-null. */
  private val scoredVsGateCtes: String = {
    val stop = graft.text.TextAnalysis.defaultStopwords
      .map(w => s"'$w'").mkString(", ")
    val z = s"((((${Curation.QwIntercept} + n_tokens * ${Curation.QwNTokens})" +
      s" + avg_token_len * ${Curation.QwAvgLen})" +
      s" + stopword_ratio * ${Curation.QwStopword})" +
      s" + punct_ratio * ${Curation.QwPunct})"
    s"""f AS (SELECT doc_id,
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
       |r AS (SELECT round(1.0 / (1.0 + exp(-$z)), 6) AS s,
       |    (n_tokens >= 30 AND n_tokens <= 10000
       |      AND avg_token_len >= 2.0 AND avg_token_len <= 12.0
       |      AND stopword_ratio >= 0.01 AND punct_ratio <= 0.2) AS y
       |  FROM f
       |  WHERE round(1.0 / (1.0 + exp(-$z)), 6) IS NOT NULL
       |    AND (n_tokens >= 30 AND n_tokens <= 10000
       |      AND avg_token_len >= 2.0 AND avg_token_len <= 12.0
       |      AND stopword_ratio >= 0.01 AND punct_ratio <= 0.2) IS NOT NULL)""".stripMargin
  }

  val q144_auc_quality: Q = (s, dir) =>
    graft.ml.Eval.aucRoc(scoredVsGate(s, dir), col("qscore"),
      col("gate_keep"))

  val q144_sql: String =
    s"""WITH $scoredVsGateCtes,
       |g AS (SELECT s, count(*) AS n,
       |        sum(CASE WHEN y THEN 1 ELSE 0 END) AS np
       |      FROM r GROUP BY s),
       |rk AS (SELECT n, np,
       |         sum(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS run
       |       FROM g),
       |a AS (SELECT sum(n) AS n, sum(np) AS n_pos, count(*) AS n_scores,
       |        sum(np * (2 * run - n + 1)) AS r2
       |      FROM rk)
       |SELECT CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       |  CAST(n - n_pos AS BIGINT) AS n_neg,
       |  CAST(n_scores AS BIGINT) AS n_scores,
       |  CASE WHEN n_pos > 0 AND n > n_pos
       |    THEN round(CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
       |               / (CAST(n_pos AS DOUBLE)
       |                  * CAST(n - n_pos AS DOUBLE) * 2.0), 6)
       |    ELSE NULL END AS auc
       |FROM a""".stripMargin

  val q145_calibration: Q = (s, dir) =>
    graft.ml.Eval.calibration(scoredVsGate(s, dir), col("qscore"),
      col("gate_keep"), bins = 10)

  val q145_sql: String =
    s"""WITH $scoredVsGateCtes,
       |g AS (SELECT least(CAST(floor(s * 10) AS INTEGER), 9) AS bin,
       |        count(*) AS n,
       |        sum(CASE WHEN y THEN 1 ELSE 0 END) AS n_pos,
       |        sum(CAST(round(s * 1000000.0, 0) AS BIGINT)) AS pm
       |      FROM r GROUP BY 1)
       |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
       |  CAST(n_pos AS BIGINT) AS n_pos,
       |  round(CAST(pm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 6) AS mean_pred,
       |  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos,
       |  round(abs(round(CAST(pm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 6)
       |            - round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6)), 6) AS abs_gap
       |FROM g ORDER BY bin""".stripMargin

  // --------------------------------------------------------------- q150
  // Proper scoring rules for the same rater pair: Brier score (exact
  // integer micro-unit squared errors) and base-2 log-loss (per-term
  // micro-rounded, predictions clamped to [1e-6, 1-1e-6] so a
  // confident-wrong answer costs ~19.93 bits, not infinity). One
  // map-side-combined aggregate, one output row.
  val q150_brier_logloss: Q = (s, dir) =>
    graft.ml.Eval.brierLogLoss(scoredVsGate(s, dir), col("qscore"),
      col("gate_keep"))

  val q150_sql: String =
    s"""WITH $scoredVsGateCtes,
       |t AS (SELECT CAST(round(s * 1000000.0, 0) AS BIGINT) AS pm,
       |        CASE WHEN y THEN 1000000 ELSE 0 END AS ym,
       |        CASE WHEN y THEN 1 ELSE 0 END AS yy,
       |        least(greatest(CAST(round(s * 1000000.0, 0) AS BIGINT), 1),
       |              999999) AS pmc
       |      FROM r),
       |a AS (SELECT count(*) AS n, sum(yy) AS n_pos,
       |        sum((pm - ym) * (pm - ym)) AS sse,
       |        sum(CAST(round(-log2(
       |              CAST(CASE WHEN yy = 1 THEN pmc ELSE 1000000 - pmc END AS DOUBLE)
       |              / 1000000.0) * 1000000.0, 0) AS BIGINT)) AS sll
       |      FROM t)
       |SELECT CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       |  round(CAST(sse AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12), 6) AS brier,
       |  round(CAST(sll AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6), 6) AS log_loss_bits
       |FROM a""".stripMargin

  // --------------------------------------------------------------- q151
  // Rank-agreement audit between two INDEPENDENT quality signals: the
  // q112 classifier probability vs the q146 LM bits-per-token,
  // Spearman-correlated per document. Pearson on raw values would mix
  // the sigmoid's scale with the LM's log scale; rank correlation
  // asks only "do they order the corpus the same way?" — the check
  // that decides whether a cheap signal can gate for an expensive one.
  val q151_score_agreement: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val model = graft.ml.Logit.Model(
      Seq("n_tokens", "avg_token_len", "stopword_ratio", "punct_ratio"),
      Array(Curation.QwNTokens, Curation.QwAvgLen, Curation.QwStopword,
        Curation.QwPunct), Curation.QwIntercept)
    val scored = graft.text.TextAnalysis.qualityFeatures(docs, col("text"))
      .select(col("doc_id"), round(model.scoreExpr, 6).as("qscore"))
    val ppl = graft.text.LangModel
      .perplexityBits(docs, docs, col("doc_id"), col("text"))
      .withColumnRenamed("id", "doc_id")
    graft.ml.Eval.spearman(scored.join(ppl, "doc_id"),
      col("qscore"), col("bits_per_token"))
  }

  val q151_sql: String = {
    val z = s"((((${Curation.QwIntercept} + n_tokens * ${Curation.QwNTokens})" +
      s" + avg_token_len * ${Curation.QwAvgLen})" +
      s" + stopword_ratio * ${Curation.QwStopword})" +
      s" + punct_ratio * ${Curation.QwPunct})"
    s"""WITH $scoredVsGateCtes,
       |${CorpusQueries.lmCtes},
       |sc AS (SELECT doc_id, round(1.0 / (1.0 + exp(-$z)), 6) AS xv FROM f),
       |p AS (SELECT doc_id,
       |        round(-CAST(s AS DOUBLE) / (CAST(nb AS DOUBLE) * 1000000.0), 6) AS yv
       |      FROM d),
       |jj AS (SELECT xv, yv FROM sc JOIN p USING (doc_id)),
       |gx AS (SELECT xv, count(*) AS n FROM jj GROUP BY xv),
       |rx AS (SELECT xv, 2 * sum(n) OVER (ORDER BY xv ROWS UNBOUNDED PRECEDING)
       |         - n + 1 AS ra FROM gx),
       |gy AS (SELECT yv, count(*) AS n FROM jj GROUP BY yv),
       |ry AS (SELECT yv, 2 * sum(n) OVER (ORDER BY yv ROWS UNBOUNDED PRECEDING)
       |         - n + 1 AS rb FROM gy),
       |jr AS (SELECT ra, rb FROM jj JOIN rx USING (xv) JOIN ry USING (yv)),
       |ag AS (SELECT count(*) AS n, sum(ra) AS sa, sum(rb) AS sb,
       |         sum(ra * ra) AS saa, sum(rb * rb) AS sbb,
       |         sum(ra * rb) AS sab FROM jr)
       |SELECT CAST(n AS BIGINT) AS n,
       |  CASE WHEN CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
       |            - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) > 0
       |        AND CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
       |            - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0
       |    THEN round((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
       |                - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
       |          / (sqrt(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
       |                  - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
       |             * sqrt(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
       |                    - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6)
       |    END AS spearman_rho
       |FROM ag""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q117_triangles" -> q117_triangles,
    "q118_edit_distance" -> q118_edit_distance,
    "q119_containment" -> q119_containment,
    "q231_containment_census" -> q231_containment_census,
    "q120_markov" -> q120_markov,
    "q121_temperature_mixture" -> q121_temperature_mixture,
    "q122_weighted_overlap" -> q122_weighted_overlap,
    "q222_overlap_census" -> q222_overlap_census,
    "q235_prefix_weighted_overlap" -> q235_prefix_weighted_overlap,
    "q238_prefix_overlap_census" -> q238_prefix_overlap_census,
    "q123_char_entropy" -> q123_char_entropy,
    "q124_winnow_candidates" -> q124_winnow_candidates,
    "q125_quality_canonical" -> q125_quality_canonical,
    "q185_component_split" -> q185_component_split,
    "q190_source_report_card" -> q190_source_report_card,
    "q192_waterfill_mixture" -> q192_waterfill_mixture,
    "q197_doremi_weights" -> q197_doremi_weights,
    "q203_dedup_weights" -> q203_dedup_weights,
    "q205_preference_pairs" -> q205_preference_pairs,
    "q169_quality_canonical_full" -> q169_quality_canonical_full,
    "q126_count_anomalies" -> q126_count_anomalies,
    "q127_pmi_collocations" -> q127_pmi_collocations,
    "q128_psi_drift" -> q128_psi_drift,
    "q129_centroid_cosine" -> q129_centroid_cosine,
    "q130_fk_audit" -> q130_fk_audit,
    "q131_unique_audit" -> q131_unique_audit,
    "q132_burstiness" -> q132_burstiness,
    "q133_concentration" -> q133_concentration,
    "q134_entropy" -> q134_entropy,
    "q135_zipf" -> q135_zipf,
    "q136_rater_kappa" -> q136_rater_kappa,
    "q137_jsd_matrix" -> q137_jsd_matrix,
    "q138_decontaminate" -> q138_decontaminate,
    "q144_auc_quality" -> q144_auc_quality,
    "q145_calibration" -> q145_calibration,
    "q150_brier_logloss" -> q150_brier_logloss,
    "q151_score_agreement" -> q151_score_agreement)

  val oracle: Map[String, String] = Map(
    "q117_triangles" -> q117_sql,
    "q118_edit_distance" -> q118_sql,
    "q119_containment" -> q119_sql,
    "q231_containment_census" -> q231_sql,
    "q120_markov" -> q120_sql,
    "q121_temperature_mixture" -> q121_sql,
    "q122_weighted_overlap" -> q122_sql,
    "q222_overlap_census" -> q222_sql,
    "q235_prefix_weighted_overlap" -> q235_sql,
    "q238_prefix_overlap_census" -> q238_sql,
    "q123_char_entropy" -> q123_sql,
    "q124_winnow_candidates" -> q124_sql,
    "q125_quality_canonical" -> q125_sql,
    "q185_component_split" -> q185_sql,
    "q190_source_report_card" -> q190_sql,
    "q192_waterfill_mixture" -> q192_sql,
    "q197_doremi_weights" -> q197_sql,
    "q203_dedup_weights" -> q203_sql,
    "q205_preference_pairs" -> q205_sql,
    "q169_quality_canonical_full" -> q169_sql,
    "q126_count_anomalies" -> q126_sql,
    "q127_pmi_collocations" -> q127_sql,
    "q128_psi_drift" -> q128_sql,
    "q129_centroid_cosine" -> q129_sql,
    "q130_fk_audit" -> q130_sql,
    "q131_unique_audit" -> q131_sql,
    "q132_burstiness" -> q132_sql,
    "q133_concentration" -> q133_sql,
    "q134_entropy" -> q134_sql,
    "q135_zipf" -> q135_sql,
    "q136_rater_kappa" -> q136_sql,
    "q137_jsd_matrix" -> q137_sql,
    "q138_decontaminate" -> q138_sql,
    "q144_auc_quality" -> q144_sql,
    "q145_calibration" -> q145_sql,
    "q150_brier_logloss" -> q150_sql,
    "q151_score_agreement" -> q151_sql)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.operators.Sampling
import graft.similarity.Similarity

/** Dataset-integrity audits: the checks a training corpus runs AFTER
  * curation and BEFORE money is spent on a run — does the holdout
  * leak through near-duplicates, are the embeddings healthy, can an
  * eval draw be reproduced, do labels agree with embedding geometry.
  * Every query hash-checks against the DuckDB oracle (integer counts,
  * micro-unit norm sums, 6dp-rounded ratios).
  */
object Integrity {

  type Q = (SparkSession, String) => DataFrame

  // --------------------------------------------------------------- q139
  // Split-leakage audit: MinHash-LSH near-dup candidate pairs that
  // straddle the deterministic 30% holdout (the q80 md5-bucket split).
  // A training doc that is a near-dup of a held-out doc leaks the
  // holdout — the audit every eval split needs before its numbers can
  // be trusted. Pairs are candidates-only (banding equi-join output,
  // bounded); the split flags join by plain id equi-joins, so nothing
  // pair-shaped carries corpus volume.
  val q139_split_leakage: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val pairs = Dedup.minhashCandidates(docs, col("doc_id"), col("text"),
      shingleHasher = Dedup.shingleHashes32Md5)
    val split = docs.select(col("doc_id"),
      (Sampling.md5KeyBucket(Seq("doc_id"), 42L) < 300000L)
        .cast("long").as("is_test"))
    Sampling.crossSplitPairs(pairs, split)
      .orderBy("id_a", "id_b")
  }

  val q139_sql: String =
    s"""WITH ${TextSim.minhashCandCtes("")},
       |s AS (SELECT doc_id,
       |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || '42'), 1, 8) AS BIGINT)
       |              % 1000000 < 300000 THEN 1 ELSE 0 END AS t
       |    FROM documents)
       |SELECT id_a, id_b, CAST(sa.t AS BIGINT) AS test_a, CAST(sb.t AS BIGINT) AS test_b
       |FROM cand JOIN s sa ON id_a = sa.doc_id JOIN s sb ON id_b = sb.doc_id
       |WHERE sa.t <> sb.t ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------------------- q140
  // Embedding-health census per label: count, dimension bounds,
  // zero-vector count, norm statistics. Catches the broken-encoder
  // failure modes (all-zero rows, truncated dims, collapsed norms)
  // with one narrow projection + one map-side-combined aggregate.
  val q140_embed_health: Q = (s, dir) =>
    Similarity.embeddingHealth(
      Tables.load(s, dir, "embeddings"), col("label"), col("embedding"))
      .withColumnRenamed("grp", "label")
      .orderBy("label")

  val q140_sql: String =
    """WITH v AS (SELECT label, CAST(len(embedding) AS BIGINT) AS dim,
      |    CAST(round(sqrt(list_sum(list_transform(embedding,
      |        x -> CAST(x AS DOUBLE) * x))) * 1000000) AS BIGINT) AS nrm_micro,
      |    round(sqrt(list_sum(list_transform(embedding,
      |        x -> CAST(x AS DOUBLE) * x))), 6) AS nrm6
      |  FROM embeddings)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
      |  min(dim) AS dim_min, max(dim) AS dim_max,
      |  CAST(count(*) FILTER (WHERE nrm_micro = 0) AS BIGINT) AS n_zero,
      |  round(CAST(sum(nrm_micro) AS DOUBLE) / count(*) / 1000000.0, 6) AS mean_norm,
      |  min(nrm6) AS min_norm, max(nrm6) AS max_norm
      |FROM v GROUP BY label ORDER BY label""".stripMargin

  // --------------------------------------------------------------- q213
  // Vector-validity acceptance census: per label, how many embeddings
  // each finiteVec exclusion reason hits (null array / null component /
  // NaN / ±Inf) and how many are usable. This is the observable twin of
  // the hygiene filter every vector operator applies at entry
  // (Similarity.finiteVec): n_vecs − n_usable IS the number of rows
  // train/encode/search silently skip, so the exclusion never hides.
  // On the driver corpora every reason column is 0 and n_usable =
  // n_vecs — the census proves the filters are no-ops on clean data.
  val q213_embed_validity: Q = (s, dir) =>
    Similarity.vectorValidityCensus(
      Tables.load(s, dir, "embeddings"), col("label"), col("embedding"))
      .withColumnRenamed("grp", "label")
      .orderBy(asc_nulls_first("label"))

  val q213_sql: String =
    """WITH v AS (SELECT label,
      |    (embedding IS NULL) AS nv,
      |    coalesce(len(list_filter(embedding, x -> x IS NULL)) > 0, FALSE) AS nc,
      |    coalesce(len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)))) > 0, FALSE) AS nn,
      |    coalesce(len(list_filter(embedding, x -> isinf(CAST(x AS DOUBLE)))) > 0, FALSE) AS ni,
      |    coalesce(len(list_filter(embedding, x -> NOT isnan(CAST(x AS DOUBLE))
      |      AND NOT isinf(CAST(x AS DOUBLE))
      |      AND abs(CAST(x AS DOUBLE)) >= 9e12)) > 0, FALSE) AS nh
      |  FROM embeddings)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
      |  CAST(count(*) FILTER (WHERE nv) AS BIGINT) AS n_null_vec,
      |  CAST(count(*) FILTER (WHERE nc) AS BIGINT) AS n_null_comp,
      |  CAST(count(*) FILTER (WHERE nn) AS BIGINT) AS n_nan,
      |  CAST(count(*) FILTER (WHERE ni) AS BIGINT) AS n_inf,
      |  CAST(count(*) FILTER (WHERE nh) AS BIGINT) AS n_huge,
      |  CAST(count(*) FILTER (WHERE NOT (nv OR nc OR nn OR ni OR nh)) AS BIGINT) AS n_usable
      |FROM v GROUP BY label ORDER BY label NULLS FIRST""".stripMargin

  // --------------------------------------------------------------- q141
  // Deterministic per-source spot-check draw: exactly 5 docs per
  // source, chosen by smallest md5 key bucket — reproducible across
  // reruns and engines. The bounded-heap top-k aggregate ships ≤5
  // entries per source per task; no corpus-wide window sort.
  val q141_group_sample: Q = (s, dir) =>
    Sampling.groupSample(Tables.load(s, dir, "documents"),
      "doc_id", col("source"), 5, bucketOf = Sampling.md5KeyBucket)
      .withColumnRenamed("grp", "source")
      .orderBy("source", "rn")

  val q141_sql: String =
    """SELECT source, rn, doc_id, bucket FROM (
      |  SELECT source, doc_id, bucket,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY bucket ASC, doc_id ASC) AS rn
      |  FROM (SELECT source, doc_id,
      |      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || '42'), 1, 8) AS BIGINT)
      |        % 1000000 AS bucket
      |    FROM documents)) t
      |WHERE rn <= 5 ORDER BY source, rn""".stripMargin

  // --------------------------------------------------------------- q142
  // 1-NN label-consistency census: for a deterministic 10% audit
  // slice, does each vector's nearest neighbor share its label? Low
  // agreement for a label = mislabeled or entangled class — the cheap
  // label-quality probe before training on the labels. The audit rate
  // keeps oracle rows SF-proportional here; at corpus scale the audit
  // set is fixed-size and the scan side prunes through IVF/LSH (q35/
  // q48) instead of the brute-force broadcast.
  val q142_nn_label_agreement: Q = (s, dir) => {
    val e = Tables.load(s, dir, "embeddings")
    // 1-NN through the map-side-combinable packed argmax (the scale
    // path q223 established): bruteForceTopK's rank window materializes
    // and sorts every (query, candidate) sim row — 1.4 GB of sf1 / 2 GiB
    // spill for rows the top-1 filter immediately drops — while
    // bruteForce1NN reduces each candidate to one packed BIGINT whose
    // max() partial-aggregates map-side (bit-identical rank-1 row; the
    // DuckDB oracle still replays the window form).
    val nn = Similarity.bruteForce1NN(e, e.filter(col("vec_id") % 10 === 0))
    val lbl = e.select(col("vec_id"), col("label"))
    nn.join(lbl.withColumnsRenamed(Map("vec_id" -> "query_id", "label" -> "q_label")),
        "query_id")
      .join(lbl.withColumnsRenamed(Map("vec_id" -> "neighbor_id", "label" -> "n_label")),
        "neighbor_id")
      .groupBy(col("q_label").as("label"))
      .agg(count(lit(1)).cast("long").as("n_audited"),
        sum(when(col("q_label") === col("n_label"), 1L).otherwise(0L))
          .cast("long").as("n_agree"))
      .select(col("label"), col("n_audited"), col("n_agree"),
        round(col("n_agree").cast("double") / col("n_audited"), 6).as("agree_frac"))
      .orderBy("label")
  }

  val q142_sql: String =
    """WITH sims AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    round(list_sum(list_transform(generate_series(1, len(q.embedding)),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * x)))
      |         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * x)))), 6) AS sim
      |  FROM embeddings q JOIN embeddings c
      |  ON q.vec_id % 10 = 0 AND q.vec_id <> c.vec_id),
      |nn AS (SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      row_number() OVER (PARTITION BY query_id
      |                         ORDER BY sim DESC, neighbor_id ASC) AS rank
      |    FROM sims) r WHERE rank = 1)
      |SELECT ql.label AS label, CAST(count(*) AS BIGINT) AS n_audited,
      |  CAST(count(*) FILTER (WHERE ql.label = nl.label) AS BIGINT) AS n_agree,
      |  round(CAST(count(*) FILTER (WHERE ql.label = nl.label) AS DOUBLE)
      |        / count(*), 6) AS agree_frac
      |FROM nn JOIN embeddings ql ON nn.query_id = ql.vec_id
      |JOIN embeddings nl ON nn.neighbor_id = nl.vec_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- q223
  // 1-NN label CONFUSION census on q142's audit slice, computed
  // through [[Similarity.bruteForce1NN]]'s map-side-combinable packed
  // argmax — the scale path where q142's rank window materializes (and
  // at sf1 spills) every candidate sim row: here each scan partition
  // reduces to one packed BIGINT per query before anything shuffles.
  // The output refines q142's per-label agreement into the full
  // (label → nn label) matrix: which classes leak into which.
  val q223_nn_label_confusion: Q = (s, dir) => {
    val e = Tables.load(s, dir, "embeddings")
    val nn = Similarity.bruteForce1NN(e, e.filter(col("vec_id") % 10 === 0))
    val lbl = e.select(col("vec_id"), col("label"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("label")
    nn.join(lbl.withColumnsRenamed(
        Map("vec_id" -> "query_id", "label" -> "q_label")), "query_id")
      .join(lbl.withColumnsRenamed(
        Map("vec_id" -> "neighbor_id", "label" -> "n_label")), "neighbor_id")
      .groupBy(col("q_label").as("label"), col("n_label").as("nn_label"))
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("share",
        round(col("n").cast("double") / sum(col("n")).over(w), 6))
      .orderBy("label", "nn_label")
  }

  // 2^40 packing constants — ids fit comfortably; sim_micro ∈ [−1e6,
  // 1e6] keeps packed < 2.2e18 < 2^63 (exact BIGINT in both engines).
  val q223_sql: String =
    """WITH sims AS (
      |  SELECT q.vec_id AS query_id,
      |    (CAST(round(list_sum(list_transform(generate_series(1, len(q.embedding)),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * x)))
      |         * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * x))))
      |      * 1e6) AS BIGINT) + 1000000) * 1099511627776
      |      + (1099511627775 - c.vec_id) AS packed
      |  FROM embeddings q JOIN embeddings c
      |  ON q.vec_id % 10 = 0 AND q.vec_id <> c.vec_id),
      |nn AS (SELECT query_id,
      |         1099511627775 - (max(packed) % 1099511627776) AS neighbor_id
      |       FROM sims GROUP BY 1)
      |SELECT ql.label AS label, nl.label AS nn_label,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(CAST(count(*) AS DOUBLE)
      |        / sum(count(*)) OVER (PARTITION BY ql.label), 6) AS share
      |FROM nn JOIN embeddings ql ON nn.query_id = ql.vec_id
      |JOIN embeddings nl ON nn.neighbor_id = nl.vec_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------- q143
  // Top principal component of the embedding table by power iteration
  // — dominant drift/whitening axis as d rows (idx, loading,
  // eigenvalue). The one data-sized pass is the exact milli-unit Gram
  // aggregate; the d²-integer matrix then iterates on the driver
  // (model-sized, the IVF-centroid kind of collect). DuckDB replays
  // the identical integer arithmetic through 8 unrolled matvec CTEs.
  val q143_top_component: Q = (s, dir) =>
    graft.ml.Pca.topComponent(s, Tables.load(s, dir, "embeddings"),
      col("embedding"))
      .orderBy("idx")

  val q143_sql: String = {
    val d = 64
    val iterCtes = (1 to graft.ml.Pca.Iters).map { k =>
      s"""s$k AS MATERIALIZED (SELECT c.i, sum(c.c * v${k - 1}.v) AS s FROM c JOIN v${k - 1} ON c.j = v${k - 1}.j GROUP BY c.i),
         |m$k AS MATERIALIZED (SELECT max(abs(s)) AS m FROM s$k),
         |v$k AS MATERIALIZED (SELECT i AS j, CAST(round(CAST(s AS DOUBLE) / CAST(m AS DOUBLE) * 1000000) AS BIGINT) AS v FROM s$k, m$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT list_transform(embedding,
       |        x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS m FROM embeddings),
       |n AS MATERIALIZED (SELECT count(*) AS n FROM e),
       |sp AS MATERIALIZED (SELECT gi.i AS i, gj.j AS j, sum(e.m[gi.i + 1] * e.m[gj.j + 1]) AS sp
       |       FROM e, generate_series(0, ${d - 1}) gi(i), generate_series(0, ${d - 1}) gj(j)
       |       GROUP BY 1, 2),
       |si AS MATERIALIZED (SELECT gi.i AS i, sum(e.m[gi.i + 1]) AS s
       |       FROM e, generate_series(0, ${d - 1}) gi(i) GROUP BY 1),
       |craw AS MATERIALIZED (SELECT sp.i, sp.j, n.n * sp.sp - sa.s * sb.s AS cr
       |         FROM sp CROSS JOIN n JOIN si sa ON sp.i = sa.i JOIN si sb ON sp.j = sb.i),
       |mx AS MATERIALIZED (SELECT max(abs(cr)) AS m FROM craw),
       |c AS MATERIALIZED (SELECT i, j, CAST(round(CAST(cr AS DOUBLE) / CAST(m AS DOUBLE) * 1000000) AS BIGINT) AS c
       |      FROM craw, mx),
       |v0 AS MATERIALIZED (SELECT gi.i AS j, CAST(1000000 AS BIGINT) AS v FROM generate_series(0, ${d - 1}) gi(i)),
       |$iterCtes,
       |s9 AS MATERIALIZED (SELECT c.i, sum(c.c * v8.v) AS s FROM c JOIN v8 ON c.j = v8.j GROUP BY c.i),
       |m9 AS MATERIALIZED (SELECT max(abs(s)) AS m FROM s9),
       |sh AS MATERIALIZED (SELECT i, CAST(round(CAST(s AS DOUBLE) / CAST(m AS DOUBLE) * 1000000) AS BIGINT) AS sh FROM s9, m9),
       |ray AS MATERIALIZED (SELECT sum(v8.v * sh.sh) AS vs, sum(v8.v * v8.v) AS vv
       |        FROM v8 JOIN sh ON v8.j = sh.i)
       |SELECT CAST(v8.j AS INTEGER) AS idx,
       |  round(CAST(v8.v AS DOUBLE) / sqrt(CAST(ray.vv AS DOUBLE)), 6) AS loading,
       |  round(CAST(ray.vs AS DOUBLE) / CAST(ray.vv AS DOUBLE) * CAST(m9.m AS DOUBLE) / 1000000.0
       |        * CAST(mx.m AS DOUBLE) / 1000000.0 / CAST(n.n AS DOUBLE) / CAST(n.n AS DOUBLE)
       |        / 1000000.0, 6) AS eigenvalue
       |FROM v8 CROSS JOIN ray CROSS JOIN m9 CROSS JOIN mx CROSS JOIN n
       |ORDER BY idx""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q139_split_leakage" -> q139_split_leakage,
    "q140_embed_health" -> q140_embed_health,
    "q141_group_sample" -> q141_group_sample,
    "q142_nn_label_agreement" -> q142_nn_label_agreement,
    "q223_nn_label_confusion" -> q223_nn_label_confusion,
    "q143_top_component" -> q143_top_component,
    "q213_embed_validity" -> q213_embed_validity)

  val oracle: Map[String, String] = Map(
    "q139_split_leakage" -> q139_sql,
    "q140_embed_health" -> q140_sql,
    "q141_group_sample" -> q141_sql,
    "q142_nn_label_agreement" -> q142_sql,
    "q223_nn_label_confusion" -> q223_sql,
    "q143_top_component" -> q143_sql,
    "q213_embed_validity" -> q213_sql)
}

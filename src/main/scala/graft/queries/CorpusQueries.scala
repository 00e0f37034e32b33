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

  // --------------------------------------------------------------- q103
  // BPE merge learning (graft.text.Bpe): 5 rounds of freq-weighted
  // pair counting over the vocabulary, lexicographic tie-break; the
  // DuckDB twin unrolls the rounds as MATERIALIZED CTE stages.
  val BpeRounds = 5

  val q103_bpe_merges: Q = (s, dir) => {
    import s.implicits._
    graft.text.Bpe.learnMerges(Tables.load(s, dir, "documents"), col("text"), BpeRounds)
      .toDF("step", "pair", "freq")
      .orderBy("step")
  }

  /** Shared DuckDB CTE chain for the BPE rounds: vocabulary w, char-
    * spaced s0, then per-round (p_k winning pair, s_k rewritten vocab).
    * Stages carry `word` so the final vocab is joinable back to docs
    * (q104); p_k reads only (seq, freq) so q103's counts are unchanged. */
  private def bpeCtes(rounds: Int): String = {
    val stages = (1 to rounds).map { k =>
      s"""p$k AS MATERIALIZED (SELECT pair, sum(freq) AS c FROM (
         |    SELECT UNNEST(list_transform(generate_series(1, len(t) - 1),
         |        i -> t[i] || ' ' || t[i+1])) AS pair, freq
         |    FROM (SELECT regexp_split_to_array(seq, ' ') AS t, freq FROM s${k - 1}))
         |  GROUP BY pair ORDER BY c DESC, pair ASC LIMIT 1),
         |s$k AS MATERIALIZED (SELECT word, trim(replace(' ' || seq || ' ',
         |    ' ' || (SELECT pair FROM p$k) || ' ',
         |    ' ' || replace((SELECT pair FROM p$k), ' ', '') || ' ')) AS seq, freq
         |  FROM s${k - 1})""".stripMargin
    }.mkString(",\n")
    s"""w AS MATERIALIZED (SELECT word, count(*) AS freq FROM (
       |    SELECT UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
       |    FROM documents)
       |  WHERE length(word) > 0 GROUP BY word),
       |s0 AS MATERIALIZED (SELECT word,
       |       trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq, freq FROM w),
       |$stages""".stripMargin
  }

  val q103_sql: String = {
    val union = (1 to BpeRounds).map { k =>
      s"SELECT $k AS step, pair, CAST(c AS BIGINT) AS freq FROM p$k"
    }.mkString("\nUNION ALL ")
    s"""WITH ${bpeCtes(BpeRounds)}
       |$union
       |ORDER BY step""".stripMargin
  }

  // --------------------------------------------------------------- q104
  // BPE encode (graft.text.Bpe.tokenCounts): the learned merges are
  // applied VOCABULARY-sized (one replace chain over distinct words),
  // then one equi-join maps per-word token counts back onto the
  // exploded corpus — per-doc BPE token counts without ever shuffling
  // token arrays.
  val q104_bpe_encode: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val merges = graft.text.Bpe.learnMerges(docs, col("text"), BpeRounds)
    graft.text.Bpe.tokenCounts(docs, col("doc_id"), col("text"), merges)
      .orderBy("doc_id")
  }

  val q104_sql: String =
    s"""WITH ${bpeCtes(BpeRounds)},
       |d AS (SELECT doc_id, UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
       |      FROM documents)
       |SELECT d.doc_id,
       |  CAST(sum(len(regexp_split_to_array(v.seq, ' '))) AS BIGINT) AS n_bpe_tokens
       |FROM d JOIN s$BpeRounds v ON d.word = v.word
       |WHERE length(d.word) > 0
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  // --------------------------------------------------------------- q146
  // Bigram-LM perplexity scoring (the CCNet/KenLM quality filter):
  // self-train the add-0.5 bigram model on the corpus, score every
  // document in bits per token — high bits = improbable/gibberish
  // text. Reported as bits (perplexity = 2^bits) because pow is not
  // correctly rounded; each bigram type's log-prob rounds to a
  // micro-unit BIGINT so the per-doc sum is exact and order-free.
  val q146_lm_perplexity: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    graft.text.LangModel
      .perplexityBits(docs, docs, col("doc_id"), col("text"))
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** The q146 CTE chain up to the per-doc (doc_id, nb, s) aggregate —
    * reused by q151's rank-agreement oracle. */
  private[queries] val lmCtes: String =
    """a AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |           FROM documents),
      |o AS (SELECT doc_id, gram, split_part(gram, ' ', 1) AS w1 FROM (
      |        SELECT doc_id, UNNEST(list_transform(
      |            generate_series(1, greatest(len(toks) - 1, 0)),
      |            i -> toks[i] || ' ' || toks[i + 1])) AS gram FROM a)),
      |c12 AS (SELECT gram, w1, count(*) AS c12 FROM o GROUP BY gram, w1),
      |c1 AS (SELECT w1, count(*) AS c1 FROM o GROUP BY w1),
      |v AS (SELECT count(DISTINCT tok) AS v
      |      FROM (SELECT UNNEST(toks) AS tok FROM a)),
      |lm AS (SELECT gram, CAST(round(log2(
      |           (CAST(c12 AS DOUBLE) + 0.5)
      |           / (CAST(c1 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)))
      |         * 1000000.0, 0) AS BIGINT) AS lpm
      |       FROM c12 JOIN c1 USING (w1) CROSS JOIN v),
      |d AS (SELECT doc_id, count(*) AS nb, sum(lpm) AS s
      |      FROM o JOIN lm USING (gram) GROUP BY doc_id)""".stripMargin

  val q146_sql: String =
    s"""WITH $lmCtes
       |SELECT doc_id, CAST(nb AS BIGINT) AS n_bigrams,
       |  round(-CAST(s AS DOUBLE) / (CAST(nb AS DOUBLE) * 1000000.0), 6) AS bits_per_token
       |FROM d ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q152
  // Vocabulary coverage curve: share of token occurrences covered by
  // the top-k types for each budget k — the tokenizer-sizing
  // saturation diagnostic. Tie-robust: computed from per-COUNT groups,
  // so equal-count types never need a pinned order.
  val q152_coverage_curve: Q = (s, dir) =>
    Corpus.coverageCurve(Tables.load(s, dir, "documents"), col("text"))

  val q152_sql: String =
    """WITH t AS (SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token
      |           FROM documents),
      |vc AS (SELECT token, count(*) AS c FROM t GROUP BY token),
      |g AS (SELECT c, count(*) AS n_types FROM vc GROUP BY c),
      |cum AS (SELECT c, n_types,
      |          sum(n_types) OVER (ORDER BY c DESC ROWS UNBOUNDED PRECEDING)
      |            - n_types AS types_above
      |        FROM g),
      |kk AS (SELECT UNNEST([1, 2, 4, 8, 16, 32, 64]) AS k)
      |SELECT CAST(k AS BIGINT) AS k,
      |  CAST(sum(least(n_types, greatest(k - types_above, 0))) AS BIGINT) AS n_types_used,
      |  CAST(sum(c * least(n_types, greatest(k - types_above, 0))) AS BIGINT) AS covered_tokens,
      |  CAST(sum(c * n_types) AS BIGINT) AS total_tokens,
      |  round(CAST(sum(c * least(n_types, greatest(k - types_above, 0))) AS DOUBLE)
      |        / CAST(sum(c * n_types) AS DOUBLE), 6) AS share
      |FROM cum CROSS JOIN kk GROUP BY k ORDER BY k""".stripMargin

  // --------------------------------------------------------------- q154
  // Tokenizer fertility census: BPE tokens per whitespace word, per
  // source — the compression-quality gauge for a learned vocabulary
  // (fertility near 1 = the merges cover the source's words; high
  // fertility = out-of-domain text pays more sequence length per word
  // and distorts any token-budgeted mixture). Reuses q103's learned
  // merges and q104's vocabulary-sized encode.
  val q154_bpe_fertility: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val merges = graft.text.Bpe.learnMerges(docs, col("text"), BpeRounds)
    val bpe = graft.text.Bpe.tokenCounts(docs, col("doc_id"), col("text"), merges)
    val ws = docs.select(col("doc_id"), col("source"),
      size(graft.text.TextAnalysis.tokens(col("text"))).cast("long").as("n_ws"))
    ws.join(bpe, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_bpe_tokens").as("n_bpe_tokens"),
        sum("n_ws").as("n_ws_tokens"),
        round(sum("n_bpe_tokens").cast("double") /
          sum("n_ws").cast("double"), 6).as("fertility"))
      .orderBy("source")
  }

  lazy val q154_sql: String =
    s"""WITH ${bpeCtes(BpeRounds)},
       |d AS (SELECT doc_id, UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
       |      FROM documents),
       |pb AS (SELECT d.doc_id,
       |         sum(len(regexp_split_to_array(v.seq, ' '))) AS nb
       |       FROM d JOIN s$BpeRounds v ON d.word = v.word
       |       WHERE length(d.word) > 0
       |       GROUP BY d.doc_id),
       |ws AS (SELECT doc_id, source,
       |         len(regexp_split_to_array(trim(text), '\\s+')) AS nw
       |       FROM documents)
       |SELECT ws.source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(pb.nb) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(ws.nw) AS BIGINT) AS n_ws_tokens,
       |  round(CAST(sum(pb.nb) AS DOUBLE) / CAST(sum(ws.nw) AS DOUBLE), 6) AS fertility
       |FROM ws JOIN pb USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- q157
  // n-gram diversity (distinct-n) per source, n = 1..3: the ratio of
  // unique n-grams to total n-grams — the mode-collapse audit for
  // synthetic/generated data (a source whose distinct-2/distinct-3
  // crater against its peers is emitting the same phrases over and
  // over; natural text stays high). Two-stage per n: groupBy
  // (source, gram) with map-side combine, then a per-source rollup —
  // the distinct-count shape that never Expands, and the gram shuffle
  // is the only data-sized move.
  val q157_distinct_ngrams: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    val perN = (1 to 3).map { n =>
      docs.select(col("source"),
          explode(graft.text.TextAnalysis.ngrams(
            graft.text.TextAnalysis.tokens(col("text")), n)).as("g"))
        .groupBy(col("source"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum("c").as("n_total"), count(lit(1)).as("n_distinct"))
        .select(col("source"), lit(n).cast("long").as("n"),
          col("n_total"), col("n_distinct"),
          round(col("n_distinct").cast("double") /
            col("n_total").cast("double"), 6).as("distinct_ratio"))
    }
    perN.reduce(_.unionAll(_)).orderBy("source", "n")
  }

  val q157_sql: String =
    """WITH t AS (SELECT source, regexp_split_to_array(trim(text), '\s+') AS toks
      |           FROM documents),
      |g AS (
      |  SELECT source, 1 AS n, UNNEST(toks) AS g FROM t
      |  UNION ALL
      |  SELECT source, 2, UNNEST(list_transform(generate_series(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i + 1])) FROM t
      |  UNION ALL
      |  SELECT source, 3, UNNEST(list_transform(generate_series(1, len(toks) - 2),
      |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) FROM t),
      |c AS (SELECT source, n, g, count(*) AS c FROM g GROUP BY 1, 2, 3)
      |SELECT source, CAST(n AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS n_total,
      |  CAST(count(*) AS BIGINT) AS n_distinct,
      |  round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS distinct_ratio
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------- q160
  // Sliding-window chunking (Packing.chunk): 64-token chunks with a
  // 16-token overlap — the RAG-indexing / long-document prep that
  // turns each doc into overlapping context windows. Pure per-row
  // expressions, no shuffle; the chunk text itself is in the hash
  // check, so tokenization, stepping, and the short tail chunk are all
  // pinned cross-engine.
  val q160_chunking: Q = (s, dir) =>
    graft.text.Packing.chunk(
      Tables.load(s, dir, "documents"), col("doc_id"), col("text"),
      chunkSize = 64, overlap = 16)
      .orderBy("doc_id", "chunk_idx")

  val q160_sql: String =
    """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |           FROM documents),
      |st AS (SELECT doc_id, toks,
      |         UNNEST(generate_series(1, greatest(len(toks) - 16, 1), 48)) AS s
      |       FROM t)
      |SELECT doc_id, CAST((s - 1) // 48 AS BIGINT) AS chunk_idx,
      |  array_to_string(list_slice(toks, s, s + 63), ' ') AS chunk_text,
      |  CAST(len(list_slice(toks, s, s + 63)) AS BIGINT) AS n_tokens
      |FROM st ORDER BY doc_id, chunk_idx""".stripMargin

  // --------------------------------------------------------------- q164
  // Packing-efficiency census on q50's batch assignment: batch count,
  // fill rate against the 2048-token budget, and how many batches
  // overflow (a doc longer than the budget gets its own batch — those
  // waste no space but skew sequence length). THE ops dashboard number
  // for a packing config: fill rate near 1 means the budget matches
  // the length distribution; low fill = padding waste at training
  // time. One rollup over the batch-count-sized q50 aggregate.
  val q164_packing_efficiency: Q = (s, dir) => {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(graft.text.TextAnalysis.tokens(col("text"))).as("n_tok"))
    val batches = graft.text.Packing
      .packSequential(d, col("n_tok"), 2048, Seq(col("doc_id")))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok"))
    batches.agg(
      count(lit(1)).as("n_batches"),
      sum("n_docs").as("n_docs"),
      sum("tok").as("sum_tokens"),
      round(sum("tok").cast("double") / (count(lit(1)) * 2048).cast("double"), 6)
        .as("fill_rate"),
      max("tok").as("max_batch_tokens"),
      sum(when(col("tok") > 2048, 1L).otherwise(0L)).as("n_overflow_batches"))
  }

  val q164_sql: String =
    """WITH t AS (SELECT doc_id,
      |             len(regexp_split_to_array(trim(text), '\s+')) AS n
      |           FROM documents),
      |r AS (SELECT doc_id, n,
      |        sum(n) OVER (ORDER BY doc_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
      |      FROM t),
      |b AS (SELECT CAST(floor((e - n) / 2048.0) AS BIGINT) AS batch_id,
      |        count(*) AS n_docs, sum(n) AS tok
      |      FROM r GROUP BY batch_id)
      |SELECT CAST(count(*) AS BIGINT) AS n_batches,
      |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
      |  CAST(sum(tok) AS BIGINT) AS sum_tokens,
      |  round(CAST(sum(tok) AS DOUBLE) / (count(*) * 2048), 6) AS fill_rate,
      |  CAST(max(tok) AS BIGINT) AS max_batch_tokens,
      |  CAST(sum(CASE WHEN tok > 2048 THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow_batches
      |FROM b""".stripMargin

  // --------------------------------------------------------------- q200
  // Stupid-backoff trigram scoring (Brants et al. 2007): the web-scale
  // n-gram scorer — count ratios with a fixed 0.4 multiplier per
  // back-off level, no discounting. Trained on the EVEN half of the
  // corpus and scored over ALL docs, so every back-off branch
  // (trigram hit / bigram / unigram / OOV-dropped) is genuinely
  // exercised at the gate; the per-doc branch census is the
  // train-coverage diagnostic. The double-ulp trap: alpha² must be
  // computed as double·double in BOTH engines (DuckDB's 0.4*0.4 would
  // be exact DECIMAL 0.16 — a different double than 0.4d*0.4d).
  val q200_stupid_backoff: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    graft.text.LangModel.stupidBackoffBits(
      docs, docs.filter(col("doc_id") % 2 === 0),
      col("doc_id"), col("text"))
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  val q200_sql: String = {
    val A = "CAST(0.4 AS DOUBLE)"
    s"""WITH a AS (SELECT doc_id,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
       |  FROM documents),
       |o0 AS (SELECT doc_id, tk,
       |    UNNEST(generate_series(1, greatest(len(tk) - 2, 0))) AS i FROM a),
       |occ AS (SELECT doc_id,
       |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS g3,
       |    tk[i] || ' ' || tk[i+1] AS gctx,
       |    tk[i+1] || ' ' || tk[i+2] AS g23,
       |    tk[i+1] AS w2, tk[i+2] AS w3
       |  FROM o0),
       |t3 AS (SELECT g3, count(*) AS c123 FROM occ
       |       WHERE doc_id % 2 = 0 GROUP BY 1),
       |ob AS (SELECT tk[i] || ' ' || tk[i+1] AS g2 FROM (
       |    SELECT doc_id, tk,
       |      UNNEST(generate_series(1, greatest(len(tk) - 1, 0))) AS i
       |    FROM a WHERE doc_id % 2 = 0)),
       |t2 AS (SELECT g2, count(*) AS c2 FROM ob GROUP BY 1),
       |ou AS (SELECT UNNEST(tk) AS tok FROM a WHERE doc_id % 2 = 0),
       |t1 AS (SELECT tok, count(*) AS c1 FROM ou GROUP BY 1),
       |nt AS (SELECT count(*) AS n_tot FROM ou),
       |ty AS (SELECT DISTINCT g3, gctx, g23, w2, w3 FROM occ),
       |sc AS MATERIALIZED (SELECT ty.g3,
       |    CASE WHEN t3.c123 IS NOT NULL THEN 0
       |         WHEN b23.c2 IS NOT NULL THEN 1
       |         WHEN u3.c1 IS NOT NULL THEN 2 ELSE 3 END AS branch,
       |    CAST(round(log2(CASE
       |        WHEN t3.c123 IS NOT NULL
       |          THEN CAST(t3.c123 AS DOUBLE) / CAST(ctx.c2 AS DOUBLE)
       |        WHEN b23.c2 IS NOT NULL
       |          THEN $A * CAST(b23.c2 AS DOUBLE) / CAST(u2.c1 AS DOUBLE)
       |        WHEN u3.c1 IS NOT NULL
       |          THEN $A * $A * CAST(u3.c1 AS DOUBLE)
       |               / CAST(nt.n_tot AS DOUBLE)
       |        END) * 1000000.0, 0) AS BIGINT) AS lp_micro
       |  FROM ty LEFT JOIN t3 USING (g3)
       |    LEFT JOIN t2 ctx ON ctx.g2 = ty.gctx
       |    LEFT JOIN t2 b23 ON b23.g2 = ty.g23
       |    LEFT JOIN t1 u2 ON u2.tok = ty.w2
       |    LEFT JOIN t1 u3 ON u3.tok = ty.w3
       |    CROSS JOIN nt)
       |SELECT o.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_trigrams,
       |  CAST(sum(CASE WHEN branch = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_direct,
       |  CAST(sum(CASE WHEN branch = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bo2,
       |  CAST(sum(CASE WHEN branch = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bo1,
       |  CAST(sum(CASE WHEN branch = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  CASE WHEN count(*) > sum(CASE WHEN branch = 3 THEN 1 ELSE 0 END) THEN
       |    round(-CAST(sum(CASE WHEN branch <> 3 THEN lp_micro END) AS DOUBLE)
       |      / (CAST(count(*) - sum(CASE WHEN branch = 3 THEN 1 ELSE 0 END)
       |              AS DOUBLE) * 1000000.0), 6) END AS bits_per_token
       |FROM occ o JOIN sc USING (g3)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // --------------------------------------------------------------- q202
  // Padding-waste audit for length-bucketed batching: fixed B-doc
  // batches padded to the batch max — the SFT/dataloader shape (the
  // fixed-COUNT complement of q164's fixed-TOKEN-budget packing).
  // Compares arrival-order batching against length-sorted batching in
  // one output: the waste delta IS the business case for the sort.
  // Both rankings come from the range-bucketed distributed running
  // total (rank = running sum of 1) — no single-partition window; the
  // waste ratio is an exact integer div.
  val PadBatchDocs = 16

  val q202_padding_waste: Q = (s, dir) => {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(graft.text.TextAnalysis.tokens(col("text"))).cast("long")
          .as("n_tok"))
    def strategy(name: String, order: Seq[org.apache.spark.sql.Column]) =
      graft.operators.Operators.withRunningTotal(d, lit(1L), order)
        .withColumn("batch_id",
          ((col("__run") - 1) / PadBatchDocs).cast("long"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tok"),
          max("n_tok").as("mx"))
        .agg(count(lit(1)).as("n_batches"),
          sum("tok").as("total_tokens"),
          sum(col("mx") * col("n_docs")).as("padded_slots"),
          sum(col("mx") * col("n_docs") - col("tok")).as("waste_tokens"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("total_tokens"), col("padded_slots"), col("waste_tokens"))
        .withColumn("waste_micro",
          expr("waste_tokens * 1000000 div padded_slots"))
    strategy("arrival", Seq(col("doc_id")))
      .unionByName(strategy("length_sorted", Seq(col("n_tok"), col("doc_id"))))
      .orderBy("strategy")
  }

  val q202_sql: String = {
    val B = PadBatchDocs
    def leg(name: String, order: String) =
      s"""SELECT '$name' AS strategy,
         |  CAST(count(*) AS BIGINT) AS n_batches,
         |  CAST(sum(tok) AS BIGINT) AS total_tokens,
         |  CAST(sum(mx * nd) AS BIGINT) AS padded_slots,
         |  CAST(sum(mx * nd - tok) AS BIGINT) AS waste_tokens,
         |  CAST(sum(mx * nd - tok) AS BIGINT) * 1000000
         |    // CAST(sum(mx * nd) AS BIGINT) AS waste_micro
         |FROM (SELECT b, count(*) AS nd, sum(n) AS tok, max(n) AS mx
         |      FROM (SELECT n, (row_number() OVER (ORDER BY $order) - 1) // $B AS b
         |            FROM t) GROUP BY 1)""".stripMargin
    s"""WITH t AS (SELECT doc_id,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n
       |  FROM documents)
       |${leg("arrival", "doc_id")}
       |UNION ALL
       |${leg("length_sorted", "n, doc_id")}
       |ORDER BY strategy""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q202_padding_waste" -> q202_padding_waste,
    "q200_stupid_backoff" -> q200_stupid_backoff,
    "q45_vocab" -> q45_vocab,
    "q46_bigrams" -> q46_bigrams,
    "q47_tfidf" -> q47_tfidf,
    "q49_histogram" -> q49_histogram,
    "q50_packing" -> q50_packing,
    "q103_bpe_merges" -> q103_bpe_merges,
    "q104_bpe_encode" -> q104_bpe_encode,
    "q146_lm_perplexity" -> q146_lm_perplexity,
    "q152_coverage_curve" -> q152_coverage_curve,
    "q154_bpe_fertility" -> q154_bpe_fertility,
    "q157_distinct_ngrams" -> q157_distinct_ngrams,
    "q160_chunking" -> q160_chunking,
    "q164_packing_efficiency" -> q164_packing_efficiency)

  val oracle: Map[String, String] = Map(
    "q202_padding_waste" -> q202_sql,
    "q200_stupid_backoff" -> q200_sql,
    "q45_vocab" -> q45_sql,
    "q46_bigrams" -> q46_sql,
    "q47_tfidf" -> q47_sql,
    "q49_histogram" -> q49_sql,
    "q50_packing" -> q50_sql,
    "q103_bpe_merges" -> q103_sql,
    "q104_bpe_encode" -> q104_sql,
    "q146_lm_perplexity" -> q146_sql,
    "q152_coverage_curve" -> q152_sql,
    "q154_bpe_fertility" -> q154_sql,
    "q157_distinct_ngrams" -> q157_sql,
    "q160_chunking" -> q160_sql,
    "q164_packing_efficiency" -> q164_sql)
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level text statistics: vocabulary, n-gram counts, TF-IDF.
  *
  * Shapes for 100 TB: one explode of the token array feeds a token-key
  * groupBy (the only wide shuffle, map-side combined); document
  * frequencies are a second small aggregate whose result broadcasts
  * back into the per-(doc, term) score — no per-document jobs, no
  * driver-side vocabulary. For web-scale vocabularies add a min-df cut
  * before the broadcast.
  */
object Corpus {

  /** Per-group unigram Shannon entropy: the corpus-diversity gauge
    * that separates repetitive/templated sources (entropy ≪
    * log2 n_types) from diverse natural text (entropy near the
    * uniform bound) before they enter a training mix.
    *
    * H = log2 T − (Σ c·log2 c)/T over per-(group, token) counts c,
    * T = Σc. Each c·log2 c term is rounded to an integer micro-unit
    * BIGINT before summation — the sum is exact and order-free, so it
    * hash-replays across engines and partitionings (the chi2/PMI
    * discipline; never an engine-accumulated double sum). Both
    * engines on one libm produce bit-identical log2 of the same
    * BIGINT-exact count. Bound: c·log2(c)·10⁶ must stay under 2⁶³ —
    * safe to ~2.4·10¹¹ occurrences of one token per group; widen to
    * DECIMAL(38,0) past that.
    *
    * 100 TB shape: one token explode into a map-side-combined
    * (group, token) count, then a per-group aggregate over the type
    * counts — bounded by #groups · vocabulary, never corpus-sized. */
  def unigramEntropy(df: DataFrame, group: Column, text: Column): DataFrame = {
    val counts = df
      .select(group.as("g"), explode(TextAnalysis.tokens(text)).as("token"))
      .groupBy("g", "token").agg(count(lit(1)).as("c"))
    counts.groupBy("g")
      .agg(count(lit(1)).as("n_types"), sum("c").as("n_tokens"),
        sum(round(col("c").cast("double") * log2(col("c").cast("double")) *
          lit(1e6)).cast("long")).as("sterm"))
      .select(col("g"), col("n_types"), col("n_tokens"),
        round(log2(col("n_tokens").cast("double")) -
          col("sterm").cast("double") /
            (col("n_tokens").cast("double") * lit(1e6)), 6)
          .as("entropy_bits"))
  }

  /** Per-group Zipf rank–frequency slope: OLS fit of ln(count) on
    * ln(rank) over the top `maxRank` token types. Natural text sits
    * near −1; templated/boilerplate sources flatten toward 0 and
    * generator artifacts overshoot — a corpus-quality gauge that
    * catches what per-document scores miss.
    *
    * Determinism discipline: ranks come from a total order
    * (count DESC, token ASC), each OLS term (x, y, x², xy with
    * x = ln rank, y = ln count) is rounded to an integer micro-unit
    * BIGINT before the per-group sum — exact and order-free — and the
    * closed-form slope is a fixed scalar expression over those exact
    * sums, evaluated in DOUBLE (identical bit pattern in any engine
    * on one libm). Per-term bound: ln(rank)·ln(count)·10⁶ < 2⁶³
    * always; the sums stay exact past 10⁹ types.
    *
    * 100 TB shape: the window ranks the COLLAPSED (group, token,
    * count) table — bounded by groups · vocabulary, never corpus-
    * sized — and `maxRank` caps the fit set. For web-scale
    * vocabularies pre-cut the tail (count ≥ 2 drops the hapax mass)
    * before the window. Groups with fewer than 2 ranked types are
    * dropped (the fit is undefined). */
  def zipfSlope(df: DataFrame, group: Column, text: Column,
                maxRank: Int = 1000): DataFrame = {
    require(maxRank >= 2, "zipfSlope: maxRank must be at least 2")
    val counts = df
      .select(group.as("g"), explode(TextAnalysis.tokens(text)).as("token"))
      .groupBy("g", "token").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("c").desc, col("token"))
    val x = log(col("rank").cast("double"))
    val y = log(col("c").cast("double"))
    val terms = counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= maxRank)
      .select(col("g"),
        round(x * lit(1e6)).cast("long").as("tx"),
        round(y * lit(1e6)).cast("long").as("ty"),
        round(x * x * lit(1e6)).cast("long").as("txx"),
        round(x * y * lit(1e6)).cast("long").as("txy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double")
    val sxy = col("sxy").cast("double")
    terms.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("tx").as("sx"), sum("ty").as("sy"),
        sum("txx").as("sxx"), sum("txy").as("sxy"))
      .filter(col("n") >= 2)
      .select(col("g"), col("n").as("n_types_used"),
        round((n * sxy * lit(1e6) - sx * sy) /
          (n * sxx * lit(1e6) - sx * sx), 6).as("zipf_slope"))
  }

  /** Pairwise Jensen–Shannon divergence (bits) between the unigram
    * distributions of every pair of groups — the text-side drift
    * matrix (PSI's counterpart for token distributions): 0 for
    * identical sources, 1 for disjoint vocabularies.
    *
    * Only the INNER token join is computed: a token present in one
    * side only contributes exactly p/2 to the divergence
    * (p·log2(p/(p/2)) = p), so
    * JSD = Σ_shared ½(p·log2(2p/(p+q)) + q·log2(2q/(p+q)))
    *       + ½(1 − P_shared) + ½(1 − Q_shared),
    * with the shared p/q masses recovered from EXACT BIGINT count
    * sums — no outer join, no per-pair vocabulary materialization.
    * Each shared term rounds to a micro-unit BIGINT before the sum
    * (order-free); the closing arithmetic is fixed scalar double math
    * over exact sums. Pairs with no shared token are restored by a
    * left join from the tiny totals cross-product at the maximum
    * divergence of 1 bit.
    *
    * 100 TB shape: counts collapse to groups · vocabulary; the self-
    * join fans each token across the group pairs sharing it — bounded
    * by vocabulary · #groups², with #groups a small dimension (source
    * labels, not documents). For thousands of groups, df-cut the
    * ubiquitous tokens first (they contribute near-zero terms). */
  def unigramJsd(df: DataFrame, group: Column, text: Column): DataFrame = {
    val counts = df
      .select(group.as("g"), explode(TextAnalysis.tokens(text)).as("token"))
      .groupBy("g", "token").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("g").agg(sum("c").as("t"))
    val withT = counts.join(broadcast(totals), "g")
    val a = withT.select(col("g").as("g_a"), col("token").as("tok_a"),
      col("c").as("ca"), col("t").as("ta"))
    val b = withT.select(col("g").as("g_b"), col("token").as("tok_b"),
      col("c").as("cb"), col("t").as("tb"))
    val p = col("ca").cast("double") / col("ta").cast("double")
    val q = col("cb").cast("double") / col("tb").cast("double")
    val term = (p * log2(lit(2.0) * p / (p + q)) +
      q * log2(lit(2.0) * q / (p + q))) * lit(0.5)
    val shared = a
      .join(b, col("tok_a") === col("tok_b") && col("g_a") < col("g_b"))
      .groupBy("g_a", "g_b")
      .agg(count(lit(1)).as("n_shared"), sum("ca").as("sca"),
        sum("cb").as("scb"),
        sum(round(term * lit(1e6)).cast("long")).as("sterm"))
    val pairs = totals.select(col("g").as("g_a"), col("t").as("ta"))
      .crossJoin(totals.select(col("g").as("g_b"), col("t").as("tb")))
      .filter(col("g_a") < col("g_b"))
    pairs.join(shared, Seq("g_a", "g_b"), "left")
      .select(col("g_a"), col("g_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_types"),
        round(coalesce(col("sterm"), lit(0L)).cast("double") / lit(1e6) +
          lit(0.5) * (lit(1.0) -
            coalesce(col("sca"), lit(0L)).cast("double") /
              col("ta").cast("double")) +
          lit(0.5) * (lit(1.0) -
            coalesce(col("scb"), lit(0L)).cast("double") /
              col("tb").cast("double")), 6).as("jsd_bits"))
  }

  /** (token, n_total, n_docs) global vocabulary statistics. */
  def vocabulary(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), explode(TextAnalysis.tokens(text)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_total"), countDistinct(col("doc_id")).as("n_docs"))

  /** Corpus n-gram (word) counts. Grams assemble by zipping the token
    * array with its shifted selves (`zip_with` chain + array_compact) —
    * ~8× faster than per-position indexed transform(sequence(...)),
    * which interprets an element_at per gram token. */
  def ngramCounts(df: DataFrame, text: Column, n: Int): DataFrame =
    df.select(explode(TextAnalysis.ngrams(TextAnalysis.tokens(text), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))

  /** PMI collocation mining: pointwise mutual information of every
    * word bigram, PMI = log2(c₁₂·T / (c₁·c₂)) with unigram counts c
    * over T total tokens — the phrase detector ("new york" scores
    * high, "of the" scores ~0) that feeds tokenizer vocab curation.
    *
    * Determinism: all counts are exact BIGINTs; both products stay in
    * BIGINT and convert exactly to double while c₁₂·T < 2^53 (~9·10¹⁵
    * — beyond that, pre-divide by gcd or go DECIMAL); one log2 and one
    * round(…,6) per row, no float accumulation anywhere.
    *
    * 100 TB shape: one token explode → unigram groupBy, one bigram
    * explode → bigram groupBy (both map-side combined, the only wide
    * shuffles); the min-count cut prunes the bigram table BEFORE the
    * two vocab joins; T is a lazy 1-row broadcast. */
  def pmiCollocations(df: DataFrame, text: Column,
                      minCount: Long): DataFrame = {
    val toks = df.select(TextAnalysis.tokens(text).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum("c").as("__t"))
    val bi = toks
      .select(explode(TextAnalysis.ngrams(col("toks"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
      .select(split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"), col("c12"))
    bi.join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        round(log2((col("c12") * col("__t")).cast("double") /
          (col("c1") * col("c2")).cast("double")), 6).as("pmi"))
  }

  /** Heaps-law vocabulary-growth curve: for every document id that
    * introduces at least one new token type, the number of new types it
    * contributes and the cumulative vocabulary size after it — the
    * measurement behind "how much new vocabulary does the next shard
    * buy". First occurrences come from one token-keyed `min(doc_id)`
    * aggregate (map-side combined); the cumulative sum runs through the
    * distributed range-bucketed prefix sum
    * ([[graft.operators.Operators.withRunningTotal]]) — no
    * single-partition window even when millions of documents introduce
    * types. */
  def vocabGrowth(df: DataFrame, id: Column, toks: Column): DataFrame = {
    val firstDoc = df
      .select(id.as("doc_id"), explode(toks).as("token"))
      .groupBy("token").agg(min("doc_id").as("first_doc"))
    val newTypes = firstDoc.groupBy("first_doc")
      .agg(count(lit(1)).as("new_types"))
    graft.operators.Operators
      .withRunningTotal(newTypes, col("new_types"), Seq(col("first_doc")))
      .select(col("first_doc"), col("new_types"), col("__run").as("vocab_size"))
  }

  /** Per-document n-gram NOVELTY census: of a doc's distinct shingles,
    * how many first appear in THIS doc (ingest order = id order)?
    * The scheduling signal behind novelty-ordered curricula and the
    * per-doc complement of [[vocabGrowth]]'s corpus curve. Integer
    * micro fraction, exact. Two map-side-combined aggregates over the
    * distinct (doc, gram) relation; nothing downstream is corpus-sized
    * beyond the doc census itself. */
  def noveltyCensus(df: DataFrame, id: Column, toks: Column): DataFrame = {
    val grams = df.select(id.as("doc_id"), explode(toks).as("gram")).distinct()
    val firstDoc = grams.groupBy("gram").agg(min("doc_id").as("first_doc"))
    val perDoc = grams.join(firstDoc, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("first_doc") === col("doc_id"), lit(1))).as("n_new"))
    perDoc
      .withColumn("novelty_micro", expr("n_new * 1000000L div n_grams"))
  }

  /** Per-(doc, term) TF-IDF with sklearn-style smoothing:
    * idf = ln((1+N)/(1+df)) + 1. One explode → tf groupBy; df from the
    * same relation; N broadcast as a literal-free 1-row aggregate. */
  def tfidf(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tokens = df
      .select(id.as("doc_id"), explode(TextAnalysis.tokens(text)).as("token"))
    val tf = tokens.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tokens.select("doc_id", "token").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * (log((lit(1) + col("n_docs")) / (lit(1) + col("df"))) + 1), 6))
      .select("doc_id", "token", "tf", "df", "tfidf")
  }

  /** Vocabulary coverage curve: for each budget k, what fraction of
    * all token OCCURRENCES do the k most frequent types cover? The
    * tokenizer-sizing diagnostic (pick the vocab budget where the
    * curve saturates) and the Zipf-mass complement of [[Corpus.zipfSlope]]'s
    * rank-frequency fit.
    *
    * Tie-robust by construction: the corpus collapses to per-COUNT
    * groups `(c, n_types)` — which equal-count types land inside a
    * budget is ambiguous, but their contribution `c · (types taken)`
    * is not, so the curve is a pure function of the count multiset
    * (no tie-order dependence to pin across engines). All integer:
    * covered(k) = Σ_groups c · min(n_types, max(0, k − types_above)).
    *
    * 100 TB shape: one token explode into the map-side-combined vocab
    * count, a second collapse to distinct COUNTS (≤ O(√occurrences)
    * groups by Zipf), the types-above prefix via the distributed
    * range-bucket running total, then a broadcast cross-join with the
    * tiny k list — nothing after the first aggregate is corpus-sized. */
  def coverageCurve(df: DataFrame, text: Column,
                    ks: Seq[Int] = Seq(1, 2, 4, 8, 16, 32, 64)): DataFrame = {
    val counts = df
      .select(explode(TextAnalysis.tokens(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .groupBy("c").agg(count(lit(1)).as("n_types"))
    // types_above = running total of n_types over counts DESC
    val cum = graft.operators.Operators
      .withRunningTotal(counts, col("n_types"), Seq(-col("c")))
      .select(col("c"), col("n_types"),
        (col("__run") - col("n_types")).as("types_above"))
    val spark = df.sparkSession
    import spark.implicits._
    val kDf = ks.map(_.toLong).toDF("k")
    cum.crossJoin(broadcast(kDf))
      .groupBy("k")
      .agg(
        sum(least(col("n_types"),
          greatest(col("k") - col("types_above"), lit(0L)))).as("n_types_used"),
        sum(col("c") * least(col("n_types"),
          greatest(col("k") - col("types_above"), lit(0L)))).as("covered_tokens"),
        sum(col("c") * col("n_types")).as("total_tokens"))
      .select(col("k"), col("n_types_used"), col("covered_tokens"),
        col("total_tokens"),
        round(col("covered_tokens").cast("double") /
          col("total_tokens").cast("double"), 6).as("share"))
      .orderBy("k")
  }
}

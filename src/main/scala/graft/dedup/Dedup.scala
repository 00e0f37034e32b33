package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines, each designed
  * for the 100 TB shape:
  *
  *  - exact dedup: hash-groupBy — one shuffle on a 64/128-bit content
  *    hash, never on the full text;
  *  - MinHash + LSH banding: shingle → k minhashes → b bands → bucket
  *    self-join. The candidate join is an equi-join on (band, bandHash),
  *    so Spark shuffles O(docs·b) small keys instead of comparing
  *    O(docs²) pairs;
  *  - SimHash: 64-bit signature + banded key join, Hamming verify;
  *  - token/n-gram Jaccard: inverted-index self-join (explode → equi-join
  *    on token → per-pair intersection counts) — the classic
  *    similarity-join; prune with a length filter;
  *  - embedding near-dup: cosine threshold over LSH or brute candidates
  *    (see [[graft.similarity.Similarity]]).
  *
  * All signatures are built from seeded hash mixes (xxhash64 + affine
  * remix) — fully deterministic, no RNG state, order-independent.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  // ------------------------------------------------------------ exact

  /** Groups of byte-identical documents (by normalized-content hash).
    * Returns (fingerprint, n, doc_ids). */
  def exactDupGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(text).as("fingerprint"))
      .agg(count(lit(1)).as("n"), sort_array(collect_list(id)).as("doc_ids"))
      .filter(col("n") > 1)

  /** Keep one representative per identical-content group (min id wins —
    * deterministic, unlike dropDuplicates' arbitrary first row). */
  def dropExactDups(df: DataFrame, id: Column, text: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextAnalysis.fingerprint(text)).orderBy(id.asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // ---------------------------------------------------------- minhash

  /** Deterministic affine remix constants for hash function j (splitmix64
    * of the seed — public-domain mix, Steele et al. 2014). `a` stays
    * below 2^31 so `a·h32 + b` never overflows a signed 64-bit integer —
    * which also lets an ANSI-SQL engine (the DuckDB oracle) evaluate the
    * identical arithmetic without wraparound. */
  private[graft] def mixConstants(k: Int, seed: Long): Seq[(Long, Long)] = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until k).map { _ =>
      // a: odd, < 2^31 so a*h32 never overflows a signed long
      ((next() & 0x7fffffffL) | 1L, next() & 0xffffffffL)
    }
  }

  /** Reference column-algebra MinHash (one transform+array_min tree per
    * hash function) — kept for the native-vs-algebra equivalence spec;
    * production path is the fused [[graft.expressions.MinHashSignature]].
    */
  def minhashSignatureHof(h32: Column, numHashes: Int, seed: Long): Column =
    array(mixConstants(numHashes, seed).map { case (a, b) =>
      array_min(transform(h32, h => (h * lit(a) + lit(b)).bitwiseAND(lit(0xffffffffL))))
    }: _*)

  /** 32-bit shingle hashes (low halves of xxhash64 over n-token shingles). */
  def shingleHashes32(text: Column, shingleSize: Int): Column =
    transform(TextAnalysis.shingleHashes(text, shingleSize),
      h => h.bitwiseAND(lit(0xffffffffL)))

  /** md5-derived 32-bit value — a uniform hash both Spark and ANSI SQL
    * engines compute identically (first 8 hex chars of md5, parsed).
    * Slower than xxhash64 (hex round-trip) but cross-engine-checkable:
    * the oracle-verified dedup queries use it so the ENTIRE pipeline —
    * signatures, bands, candidates, verify — hash-matches DuckDB. */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** md5-derived 60-bit value (15 hex chars — stays under 2^63 so BIGINT
    * arithmetic is overflow-free in any engine). */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** md5-based 32-bit shingle hashes (cross-engine-checkable variant). */
  def shingleHashes32Md5(text: Column, shingleSize: Int): Column =
    transform(TextAnalysis.ngrams(TextAnalysis.tokens(text), shingleSize),
      g => md5Hash32(g))

  /** df + `sig` column: two-stage projection — shingle hashing runs once
    * per row, then ONE fused native loop computes all k mins
    * ([[graft.expressions.MinHashSignature]]; empty docs hash to the
    * 2^32−1 sentinel per slot). */
  def withMinhashSignature(df: DataFrame, id: Column, text: Column,
                           numHashes: Int = 64, shingleSize: Int = 3,
                           seed: Long = 42L,
                           shingleHasher: (Column, Int) => Column = shingleHashes32): DataFrame = {
    val (as, bs) = mixConstants(numHashes, seed).unzip
    df.select(id.as("id"), shingleHasher(text, shingleSize).as("__h32"))
      .select(col("id"), graft.expressions.HashExpressions
        .minhash_signature(col("__h32"), as.toArray, bs.toArray).as("sig"))
  }

  /** LSH banding: explode the signature into `bands` (band, bandHash)
    * keys. Two docs sharing any band key are candidates. The band hash
    * is a base-31 fold of the band's minhash slots — overflow-free for
    * rows ≤ 6 (values < 2^32; 31^5·2^32 < 2^57), engine-portable, and
    * cheap. Deeper bands (the q212 planner can choose 8 rows/band)
    * mask the accumulator back to 32 bits per step — keeps every
    * intermediate < 2^37 under ANSI in BOTH engines, identical
    * collision semantics, and leaves the historical rows ≤ 6 hash
    * untouched. */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column = {
    val fold: (Column, Column) => Column =
      if (rows <= 6) (acc, x) => acc * 31 + x
      else (acc, x) => (acc * 31 + x).bitwiseAND(lit(4294967295L))
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        aggregate(slice(sig, b * rows + 1, rows), lit(0L), fold).as("bh"))
    }: _*)
  }

  /** MinHash-LSH candidate pairs (id_a < id_b), deduplicated across
    * bands. `bands × rows` must equal the signature length. The join is
    * a plain equi-join on the band key: at scale this is the only
    * shuffle, keyed by tiny (int, bigint) pairs. */
  def minhashCandidates(df: DataFrame, id: Column, text: Column,
                        numHashes: Int = 64, shingleSize: Int = 3,
                        bands: Int = 16, seed: Long = 42L,
                        shingleHasher: (Column, Int) => Column = shingleHashes32): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val keyed = withMinhashSignature(df, id, text, numHashes, shingleSize, seed, shingleHasher)
      .select(col("id"), explode(lshBandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val a = keyed.alias("a")
    val b = keyed.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Cross-corpus LSH candidates: (new_id, corpus_id) pairs where a NEW
    * document shares a band key with an EXISTING-corpus document — the
    * incremental-ingest dedup shape (dedup today's batch against the
    * accumulated corpus without re-banding corpus-vs-corpus). Both
    * sides band independently with the same constants, so at scale the
    * corpus side's keys are computed once, stored, and only the
    * batch-sized side is fresh work; the join keys are (band, bh) —
    * identical cardinality behavior to the self-join candidates. */
  def minhashCandidatesAgainst(newDocs: DataFrame, corpus: DataFrame,
                               id: Column, text: Column,
                               numHashes: Int = 64, shingleSize: Int = 3,
                               bands: Int = 16, seed: Long = 42L,
                               shingleHasher: (Column, Int) => Column = shingleHashes32): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    def keys(df: DataFrame) =
      withMinhashSignature(df, id, text, numHashes, shingleSize, seed, shingleHasher)
        .select(col("id"), explode(lshBandKeys(col("sig"), bands, rows)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    keys(newDocs).alias("n")
      .join(keys(corpus).alias("c"),
        col("n.band") === col("c.band") && col("n.bh") === col("c.bh"))
      .select(col("n.id").as("new_id"), col("c.id").as("corpus_id"))
      .distinct()
  }

  /** Incremental dedup: NEW-batch rows that do NOT band-collide with the
    * existing corpus (left-anti on the cross-corpus candidates). */
  def dedupAgainstCorpus(newDocs: DataFrame, corpus: DataFrame,
                         id: Column, text: Column,
                         shingleHasher: (Column, Int) => Column = shingleHashes32): DataFrame = {
    val dupIds = minhashCandidatesAgainst(newDocs, corpus, id, text,
      shingleHasher = shingleHasher).select(col("new_id")).distinct()
    newDocs.join(dupIds, id === col("new_id"), "left_anti")
  }

  /** Exact token-set Jaccard for given pairs (verification step after
    * LSH): joins the token sets back and computes |∩| / |∪|. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, id: Column, text: Column,
                    threshold: Double): DataFrame = {
    val sets = docs.select(id.as("vid"), array_distinct(TextAnalysis.tokens(text)).as("toks"))
    pairs
      .join(sets.withColumnsRenamed(Map("vid" -> "__ida", "toks" -> "toks_a")),
        col("id_a") === col("__ida"))
      .join(sets.withColumnsRenamed(Map("vid" -> "__idb", "toks" -> "toks_b")),
        col("id_b") === col("__idb"))
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (size(col("toks_a")) + size(col("toks_b")) - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash-LSH near-dup pairs, LSH-candidates then exact-verified. */
  def minhashNearDups(df: DataFrame, id: Column, text: Column,
                      threshold: Double = 0.8, numHashes: Int = 64,
                      shingleSize: Int = 3, bands: Int = 16,
                      shingleHasher: (Column, Int) => Column = shingleHashes32): DataFrame =
    jaccardVerify(
      minhashCandidates(df, id, text, numHashes, shingleSize, bands,
        shingleHasher = shingleHasher),
      df, id, text, threshold)

  // ---------------------------------------------------------- simhash

  /** 64-bit SimHash over tokens: per bit i, sum ±1 weighted votes of
    * each token's hash bit; signature bit = sign. One fused native loop
    * ([[graft.expressions.SimHash64Expr]]) over the token-hash array. */
  def simhash64(text: Column,
                tokenHasher: Column => Column = xxhash64(_)): Column =
    graft.expressions.HashExpressions
      .simhash64(transform(TextAnalysis.tokens(text), t => tokenHasher(t)))
      .as("simhash")

  /** Column-algebra SimHash (64 aggregate folds) — equivalence-spec
    * reference for the native expression. */
  def simhash64Hof(text: Column): Column = {
    val hashes = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    val bits = (0 until 64).map { i =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << i)) =!= 0L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b)).as("simhash")
  }

  /** SimHash near-dup pairs: band the 64-bit signature into
    * `64/bitsPerBand` keys (any band match → candidate; with b bands a
    * pair within Hamming distance b−1 is guaranteed caught), then verify
    * Hamming ≤ maxHamming via bit_count(xor).
    *
    * Candidate volume inside one bucket is quadratic in bucket
    * occupancy (~n²/2^bitsPerBand expected for uniform signatures) —
    * two scale controls:
    *  - `bitsPerBand`: widen the key (e.g. 21 bits × 3 bands) to shrink
    *    expected occupancy 32× per extra 5 bits, trading recall
    *    guarantee (b bands only guarantee Hamming ≤ b−1);
    *  - `maxBucketSize`: hard cap — buckets with more members than the
    *    cap are DROPPED from candidate generation (a bucket that hot is
    *    boilerplate/template text better handled by exact dedup first),
    *    and the dropped bucket count is logged so the coverage loss is
    *    visible, never silent. */
  def simhashNearDups(df: DataFrame, id: Column, text: Column,
                      maxHamming: Int = 3,
                      tokenHasher: Column => Column = xxhash64(_),
                      bitsPerBand: Int = 16,
                      maxBucketSize: Option[Long] = None): DataFrame = {
    require(64 % bitsPerBand == 0, s"bitsPerBand must divide 64, got $bitsPerBand")
    val bands = 64 / bitsPerBand
    val mask = if (bitsPerBand == 64) -1L else (1L << bitsPerBand) - 1
    val sigs = df.select(id.as("id"), simhash64(text, tokenHasher).as("sig"))
    val bandedAll = sigs.select(col("id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * bitsPerBand).bitwiseAND(lit(mask)).as("bh"))
      }: _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val banded = maxBucketSize match {
      case None => bandedAll
      case Some(cap) =>
        val occ = bandedAll.groupBy(col("band"), col("bh"))
          .agg(count(lit(1)).as("__occ"))
        val hot = occ.filter(col("__occ") > cap)
        // counting dropped buckets is an extra job — run it only when
        // INFO logging is on; the cap (anti-join) is always applied
        if (log.isInfoEnabled) {
          val nHot = hot.count()
          if (nHot > 0) log.info(
            s"simhashNearDups: dropping $nHot buckets over occupancy cap $cap " +
              s"(bitsPerBand=$bitsPerBand); pairs only co-located there are lost")
        }
        bandedAll.join(
          hot.select(col("band").as("__hb"), col("bh").as("__hh")),
          col("band") === col("__hb") && col("bh") === col("__hh"), "left_anti")
    }
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------ dedup cluster components

  /** Connected components over near-dup pairs — the clustering step a
    * dedup pipeline runs AFTER LSH verify, so each duplicate group can
    * elect one canonical document (min id = component label).
    *
    * Fixed-iteration min-label propagation: per round, every node takes
    * the min label among itself and its neighbours — one groupBy(min) +
    * one broadcast-scale join per round, all DataFrame ops. A FIXED
    * `iters` (no data-dependent early exit) keeps the result a pure
    * function of the edges, so an ANSI oracle can replay it with
    * unrolled CTEs; `iters` bounds the component diameter it can
    * resolve (near-dup clusters are near-cliques — diameter 2-3).
    * Returns (id, component).
    *
    * THE ORACLE SHAPE, NOT THE SCALE PATH: a component with diameter
    * > `iters` is silently under-merged — chain-shaped template-
    * evolution clusters at 100× are exactly that. Production dedup
    * should call [[connectedComponentsConverged]], which iterates to a
    * zero-changes fixpoint with pointer-jumping acceleration (O(log
    * diameter) rounds) and is spec-pinned ≡ this form wherever the
    * diameter fits. */
  def connectedComponents(edges: DataFrame, iters: Int = 8,
                          checkpointer: DataFrame => DataFrame =
                            _.localCheckpoint(true)): DataFrame = {
    // eager checkpoints are load-bearing: labels feeds TWICE into each
    // next level, so without lineage truncation the logical plan
    // doubles per iteration (2^iters copies of the edge pipeline — the
    // same blowup the SQL oracle avoids with MATERIALIZED CTEs). The
    // default localCheckpoint(true) fits single-node runs; a cluster
    // job passes `_.checkpoint()` (with a reliable checkpoint dir) so
    // label state survives executor loss across rounds.
    val adj = checkpointer(
      edges.select(col("id_a").as("v"), col("id_b").as("u"))
        .union(edges.select(col("id_b").as("v"), col("id_a").as("u"))))
    var labels = checkpointer(
      adj.select(col("v").as("id")).distinct()
        .select(col("id"), col("id").as("l")))
    for (_ <- 1 to iters) {
      val neighborMin = adj
        .join(labels.withColumnsRenamed(Map("id" -> "__u", "l" -> "__lu")),
          col("u") === col("__u"))
        .groupBy(col("v")).agg(min(col("__lu")).as("__nmin"))
      labels = checkpointer(labels
        .join(neighborMin, col("id") === col("v"), "left")
        .select(col("id"), least(col("l"), coalesce(col("__nmin"), col("l"))).as("l")))
    }
    labels.select(col("id"), col("l").as("component"))
  }

  /** Convergence-checked connected components — the PRODUCTION variant
    * of [[connectedComponents]]: iterates until a round changes zero
    * labels, so components of ANY diameter label correctly (the fixed-
    * iteration form silently under-merges chains longer than `iters`).
    * Each round is one min-neighbor propagation (the same join+agg as
    * the fixed form) followed by one POINTER-JUMPING step
    * (l ← l∘l — every label skips to its label's label), which doubles
    * the effective propagation distance per round: convergence in
    * O(log diameter) rounds instead of O(diameter), one cheap node-
    * count action per round as the stop check. At the propagation
    * fixpoint both endpoints of every edge carry equal labels and the
    * jump is the identity, so a zero-changes round IS component
    * correctness (labels = component-min, since min labels only ever
    * propagate). Not oracle-replayable by design — the data-dependent
    * round count is exactly what ANSI CTE unrolling can't express;
    * ConnectedComponentsSpec pins it ≡ the fixed form on near-clique
    * corpora and correct on chains the fixed form under-labels.
    *
    * `maxRounds` is a runaway backstop, not a quality knob: pointer
    * jumping needs ~log₂(diameter) propagation rounds PLUS the one
    * zero-changes round that proves the fixpoint (a graph that merges
    * its last edge in round `maxRounds` exactly still throws — the
    * labels may be complete, but completeness is UNPROVEN without the
    * observing round), so 64 covers any graph that fits in a cluster
    * with the +1 to spare. If the backstop ever trips, this method
    * throws rather than returning possibly-under-merged labels as if
    * converged (the silent under-merge is exactly the defect of the
    * fixed-iteration form this variant exists to close). Callers that
    * prefer partial labels over failure use [[convergedWithRounds]]
    * and read the flag. */
  def connectedComponentsConverged(edges: DataFrame,
                                   maxRounds: Int = 64,
                                   checkpointer: DataFrame => DataFrame =
                                     _.localCheckpoint(true)): DataFrame = {
    val (labels, _, converged) =
      convergedWithRounds(edges, maxRounds, checkpointer)
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not OBSERVE the zero-changes fixpoint " +
          s"within maxRounds=$maxRounds — labels may be under-merged " +
          s"(convergence unproven); raise maxRounds (log2(diameter) + 1 " +
          s"rounds suffice) or use convergedWithRounds to accept " +
          s"possibly-partial labels explicitly")
    labels
  }

  /** The raw loop behind [[connectedComponentsConverged]]: returns the
    * labels, the rounds actually run, and whether the zero-changes
    * fixpoint was reached (false ⇒ the labels are a lower bound —
    * some components may still be split). */
  private[graft] def convergedWithRounds(edges: DataFrame, maxRounds: Int,
                                         checkpointer: DataFrame => DataFrame)
  : (DataFrame, Int, Boolean) = {
    val adj = checkpointer(
      edges.select(col("id_a").as("v"), col("id_b").as("u"))
        .union(edges.select(col("id_b").as("v"), col("id_a").as("u"))))
    var labels = checkpointer(
      adj.select(col("v").as("id")).distinct()
        .select(col("id"), col("id").as("l")))
    var rounds = 0
    var changed = 1L
    while (changed > 0 && rounds < maxRounds) {
      val neighborMin = adj
        .join(labels.withColumnsRenamed(Map("id" -> "__u", "l" -> "__lu")),
          col("u") === col("__u"))
        .groupBy(col("v")).agg(min(col("__lu")).as("__nmin"))
      val propagated = labels
        .join(neighborMin, col("id") === col("v"), "left")
        .select(col("id"), col("l").as("__prev"),
          least(col("l"), coalesce(col("__nmin"), col("l"))).as("__lp"))
      // pointer jump: follow the label one hop (labels are node ids,
      // so l's own label exists in the table)
      val jumped = checkpointer(propagated
        .join(labels.withColumnsRenamed(Map("id" -> "__m", "l" -> "__lm")),
          col("__lp") === col("__m"), "left")
        .select(col("id"), col("__prev"),
          least(col("__lp"), coalesce(col("__lm"), col("__lp"))).as("l")))
      changed = jumped.filter(col("l") =!= col("__prev")).count()
      labels = jumped.select("id", "l")
      rounds += 1
    }
    (labels.select(col("id"), col("l").as("component")), rounds, changed == 0L)
  }

  /** Quality-aware canonical selection: keep, per duplicate component,
    * the member with the HIGHEST `score` (ties → lowest id) instead of
    * the arbitrary min-id member [[keepCanonical]] keeps — "dedup
    * should keep the best copy, not the first one". Unclustered
    * documents form their own singleton component and always survive.
    * Returns the survivors with `component` and `cluster_size`
    * attached.
    *
    * 100 TB shape: both windows partition by component — partition
    * size = one duplicate cluster, bounded by the near-dup graph's
    * occupancy caps, never corpus-sized. */
  def keepBestByScore(docs: DataFrame, id: Column, pairs: DataFrame,
                      score: Column, iters: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comp = connectedComponents(pairs, iters)
      .withColumnsRenamed(Map("id" -> "__cid"))
    val byComp = Window.partitionBy(col("component"))
    docs.join(comp, id === col("__cid"), "left")
      .withColumn("component", coalesce(col("component"), id))
      .withColumn("cluster_size", count(lit(1)).over(byComp))
      .withColumn("__rn",
        row_number().over(byComp.orderBy(score.desc, id.asc)))
      .filter(col("__rn") === 1)
      .drop("__rn", "__cid")
  }

  /** Near-dup canonicalization: drop every document that belongs to a
    * duplicate component but is not its min-id label — the selection
    * step [[graft.pipeline.CorpusPipeline]] runs after clustering,
    * exposed as a named operator. */
  def keepCanonical(docs: DataFrame, id: Column, pairs: DataFrame,
                    iters: Int = 8): DataFrame = {
    val components = connectedComponents(pairs, iters)
      .withColumnsRenamed(Map("id" -> "__cid"))
    docs.join(components, id === col("__cid"), "left")
      .filter(col("component").isNull || id === col("component"))
      .drop("__cid", "component")
  }

  // ------------------------------------------- token-jaccard sim-join

  /** Exact all-pairs token Jaccard ≥ threshold via inverted-index
    * self-join: explode distinct tokens, equi-join on token, count
    * intersections per pair, then Jaccard from set sizes. The shuffle
    * key is the token — at 100 TB add a document-frequency cut
    * (drop tokens in >p% of docs) to bound the hottest posting lists;
    * the LSH path above is the preferred scale route. */
  def jaccardSimJoin(df: DataFrame, id: Column, text: Column,
                     threshold: Double,
                     maxDocFrequency: Double = 1.0): DataFrame =
    jaccardSimJoinOn(df, id, TextAnalysis.tokens(text), threshold, maxDocFrequency)

  /** Same inverted-index sim-join over an arbitrary item array column
    * (token sets, n-gram shingles, tags, …).
    *
    * The per-doc size table joins back by PLAIN shuffle joins — it is
    * O(n_docs) rows, and broadcasting it would OOM the driver and every
    * executor at corpus scale. The pair table is the larger side anyway,
    * so the shuffle is keyed correctly by doc id.
    *
    * `maxDocFrequency` < 1.0 enables the document-frequency cut: tokens
    * appearing in more than that fraction of documents are dropped from
    * the inverted index before the self-join. High-df tokens generate
    * the hottest posting lists (a token in every doc produces n²/2
    * candidate rows) while carrying almost no similarity signal. The
    * cut makes the reported similarity a LOWER BOUND of true Jaccard:
    * intersections lose the dropped tokens (pairs overlapping ONLY on
    * them disappear entirely) while set-size denominators keep the
    * full sets — the standard stop-token prefix-filter trade. The
    * dropped-token count is logged (one small stats job over the token
    * index). */
  def jaccardSimJoinOn(df: DataFrame, id: Column, items: Column,
                       threshold: Double,
                       maxDocFrequency: Double = 1.0): DataFrame =
    intersectionPairs(df, id, items, maxDocFrequency)
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** SAMPLED LSH recall/precision audit — the bounded-at-any-scale
    * variant of the full audit (q149/q214): the exact truth set there
    * is a full-corpus inverted-index self-join, which is PAIR-shaped
    * (262 MB of spill at sf1, growing quadratically in the near-dup
    * mass). This version anchors the audit on a deterministic
    * md5-ordered doc sample (the q212 planner's sampling discipline —
    * cross-engine replayable, no RNG): truth and candidate sets are
    * restricted to pairs with AT LEAST ONE anchored endpoint, so the
    * exact-Jaccard side joins `sampleSize` posting lists against the
    * corpus instead of the corpus against itself — work linear in the
    * corpus at fixed sample size, flat through any SF. Anchored truth
    * is an unbiased pair sample (each true pair enters iff an endpoint
    * lands in the sample), so recall/precision estimate the full
    * audit's rates; the estimates' variance shrinks as `sampleSize`
    * grows — the audit knob a 100 TB run turns instead of paying the
    * quadratic truth set. One output row: n_anchors, n_true, n_cand,
    * n_caught, recall, candidate_precision (rates null when the
    * denominator is empty). */
  def lshRecallAuditSampled(df: DataFrame, id: Column, text: Column,
                            threshold: Double, bands: Int = 16,
                            sampleSize: Int = 128, seed: Long = 42L,
                            shingleSize: Int = 3,
                            shingleHasher: (Column, Int) => Column = shingleHashes32)
  : DataFrame = {
    import graft.text.TextAnalysis
    val items = TextAnalysis.ngrams(TextAnalysis.tokens(text), shingleSize)
    // deterministic md5-ordered anchors among docs with ≥1 shingle
    // (the samplePairSims key, verbatim — ANSI-replayable)
    val key = conv(substring(md5(concat(id.cast("string"), lit("|" + seed))),
      1, 8), 16, 10).cast("long")
    val anchors = df.select(id.as("__aid"), key.as("__k"),
        size(items).as("__ni"))
      .filter(col("__ni") > 0)
      .orderBy(col("__k"), col("__aid")).limit(sampleSize)
      .select("__aid")
    // corpus-wide distinct postings; only the ANCHORED side is joined
    // against them — the pair space is sample × corpus, never corpus²
    val posts = df.select(id.as("pid"), explode(items).as("tok")).distinct()
    val sz = posts.groupBy("pid").agg(count(lit(1)).as("psz"))
    val aPosts = posts.join(broadcast(anchors), col("pid") === col("__aid"))
      .select(col("pid").as("apid"), col("tok"))
    val inter = aPosts.join(posts, Seq("tok"))
      .filter(col("apid") =!= col("pid"))
      // normalize before counting: a both-anchored pair arrives in both
      // orientations and must contribute each shared shingle once
      .select(least(col("apid"), col("pid")).as("id_a"),
        greatest(col("apid"), col("pid")).as("id_b"), col("tok"))
      .distinct()
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
    val truth = inter
      .join(sz.select(col("pid").as("id_a"), col("psz").as("sa")), "id_a")
      .join(sz.select(col("pid").as("id_b"), col("psz").as("sb")), "id_b")
      .filter(round(col("i").cast("double") /
        (col("sa") + col("sb") - col("i")), 6) >= threshold)
      .select("id_a", "id_b")
    val cand = minhashCandidates(df, id, text, bands = bands,
        shingleSize = shingleSize, seed = seed, shingleHasher = shingleHasher)
      .join(broadcast(anchors),
        col("id_a") === col("__aid") || col("id_b") === col("__aid"),
        "left_semi")
      .select("id_a", "id_b")
    val na = anchors.agg(count(lit(1)).as("n_anchors"))
    val m = truth.agg(count(lit(1)).as("n_true"))
    val c = cand.agg(count(lit(1)).as("n_cand"))
    val j = truth.join(cand, Seq("id_a", "id_b"))
      .agg(count(lit(1)).as("n_caught"))
    na.crossJoin(m).crossJoin(c).crossJoin(j).select(
      col("n_anchors"), col("n_true"), col("n_cand"), col("n_caught"),
      when(col("n_true") > 0,
        round(col("n_caught").cast("double") / col("n_true").cast("double"), 6))
        .as("recall"),
      when(col("n_cand") > 0,
        round(col("n_caught").cast("double") / col("n_cand").cast("double"), 6))
        .as("candidate_precision"))
  }

  /** Asymmetric set-containment join: |A∩B| / |A| and |A∩B| / |B| per
    * candidate pair, kept when EITHER direction reaches `threshold`.
    * Catches quote/boilerplate CONTAINMENT that symmetric Jaccard
    * misses: a 10-token quote inside a 1000-token article has Jaccard
    * ≈ 0.01 but containment 1.0. Same inverted-index plan shape (and
    * the same df-cut lower-bound trade) as [[jaccardSimJoinOn]]. */
  def containmentJoinOn(df: DataFrame, id: Column, items: Column,
                        threshold: Double,
                        maxDocFrequency: Double = 1.0): DataFrame =
    intersectionPairs(df, id, items, maxDocFrequency)
      .withColumn("cont_a_in_b", round(col("inter").cast("double") / col("sz_a"), 6))
      .withColumn("cont_b_in_a", round(col("inter").cast("double") / col("sz_b"), 6))
      .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"),
        col("sz_a").cast("long").as("sz_a"),
        col("sz_b").cast("long").as("sz_b"),
        col("cont_a_in_b"), col("cont_b_in_a"))

  /** Per-document census over the Jaccard sim-join — the count-first
    * scale path next to [[jaccardSimJoinOn]]'s pair list, completing
    * the census symmetry with [[containmentCensus]] and
    * [[weightedOverlapCensus]]: one row per document having ≥1 partner
    * at `threshold`, carrying the partner count, the strongest Jaccard
    * and the deterministic top partner (highest Jaccard, ties to the
    * lower id). Same default-pair-source contract as the siblings:
    * with no df-cut the pairs come from [[prefixFilterJaccardJoinOn]]
    * (provably identical output, the zero-GB-spill AllPairs candidate
    * plan); `plainPairs = true` forces the plain inverted-index join
    * (the q96-class demo path), and a df-cut keeps the plain path
    * because the cut is SEMANTIC — it changes which pairs exist, and
    * the prefix filter reproduces the UNCUT join only. */
  def jaccardCensus(df: DataFrame, id: Column, items: Column,
                    threshold: Double,
                    maxDocFrequency: Double = 1.0,
                    plainPairs: Boolean = false): DataFrame =
    jaccardCensusReduce(
      if (!plainPairs && maxDocFrequency >= 1.0)
        prefixFilterJaccardJoinOn(df, id, items, threshold)
      else jaccardSimJoinOn(df, id, items, threshold, maxDocFrequency))

  /** [[jaccardCensus]] over the EXACT prefix-filtered join — the
    * explicit scale-twin entry point, mirroring
    * [[prefixFilterContainmentCensus]] / [[prefixFilterWeightedOverlapCensus]].
    * Same census semantics and reduction, shared by construction. */
  def prefixFilterJaccardCensus(df: DataFrame, id: Column,
                                items: Column,
                                threshold: Double): DataFrame =
    jaccardCensusReduce(prefixFilterJaccardJoinOn(df, id, items, threshold))

  /** The census reduction shared by [[jaccardCensus]] and
    * [[prefixFilterJaccardCensus]] — factored so the demo and its
    * scale twin cannot drift (the overlapCensusReduce discipline).
    * Both directions via ONE explode; the reduction is ONE
    * ObjectHashAggregate with map-side combine — top partner via
    * [[graft.expressions.TopKAgg.top_k_ids]] k=1, whose (score DESC,
    * id ASC) order IS the census tiebreak (see
    * [[overlapCensusReduce]] for the rejected window / max_by shapes).
    * Jaccard is already rounded to 6 dp by the pair join, so max() is
    * replayable. */
  private def jaccardCensusReduce(pairs: DataFrame): DataFrame = {
    val perDir = pairs.select(explode(array(
        struct(col("id_a").as("id"), col("id_b").as("partner"),
          col("jaccard")),
        struct(col("id_b").as("id"), col("id_a").as("partner"),
          col("jaccard")))).as("e"))
      .select(col("e.id").as("id"), col("e.partner").as("partner"),
        col("e.jaccard").as("jaccard"))
    perDir.groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_partners"),
        max("jaccard").as("j_max"),
        graft.expressions.TopKAgg.top_k_ids(
          col("jaccard"), col("partner").cast("long"), 1)
          .getItem(0).getField("id").as("top_partner"))
  }

  /** Per-document census over the containment join — the count-first
    * scale path next to [[containmentJoinOn]]'s pair list (the
    * q195→q210 / [[weightedOverlapCensus]] pattern): the pair list's
    * size IS its answer at corpus scale, so the shipping form is one
    * row per document having ≥1 containment partner, carrying the
    * partner count, the document's strongest containment INSIDE a
    * partner (the "am I a quote of something bigger" signal — the
    * direction with THIS doc's size in the denominator), and the
    * deterministic top partner (highest such containment, ties to the
    * lower id). The intersection aggregation is unchanged (token-keyed
    * shuffle, map-side combine); what disappears is the answer-sized
    * sorted pair output — the census reduces per doc id in one more
    * keyed shuffle, and its window partitions per doc (bounded by
    * partner count, never corpus-sized).
    *
    * DEFAULT PAIR SOURCE: when no df-cut is requested
    * (`maxDocFrequency ≥ 1.0`), the pairs come from
    * [[prefixFilterContainmentJoinOn]] — provably identical output,
    * but the candidate plan prunes with the exact-complete prefix
    * filter instead of aggregating every hot posting list (the
    * zero-GB-spill shape; the plain path's intersection aggregation
    * spilled 3.8 GB at sf1/2 GiB). At 100× a census caller should get
    * that plan without opting in. `plainPairs = true` forces the plain
    * inverted-index join (the adjudicated q119/q122-class demo path);
    * a df-cut (`maxDocFrequency < 1.0`) also keeps the plain path,
    * because the cut is SEMANTIC — it changes which pairs exist, and
    * the prefix filter reproduces the UNCUT join only. */
  def containmentCensus(df: DataFrame, id: Column, items: Column,
                        threshold: Double,
                        maxDocFrequency: Double = 1.0,
                        plainPairs: Boolean = false): DataFrame =
    containmentCensusReduce(
      if (!plainPairs && maxDocFrequency >= 1.0)
        prefixFilterContainmentJoinOn(df, id, items, threshold)
      else containmentJoinOn(df, id, items, threshold, maxDocFrequency))

  /** [[containmentCensus]] over the EXACT prefix-filtered join — the
    * count-first scale path whose pair source is
    * [[prefixFilterContainmentJoinOn]] (provably ≡ the plain uncapped
    * join), so the census inherits the prefix scheme's zero-GB-spill
    * candidate plan instead of the df-cut demo's intersection
    * aggregation. Same census semantics and reduction, shared by
    * construction. */
  def prefixFilterContainmentCensus(df: DataFrame, id: Column,
                                    items: Column,
                                    threshold: Double): DataFrame =
    containmentCensusReduce(
      prefixFilterContainmentJoinOn(df, id, items, threshold))

  /** The census reduction shared by [[containmentCensus]] and
    * [[prefixFilterContainmentCensus]] — factored so the demo and its
    * scale twin cannot drift. Both directions via ONE explode (a
    * unionAll of two selects over `pairs` would duplicate the whole
    * pair-building lineage); the reduction is ONE ObjectHashAggregate
    * with map-side combine — top partner via
    * [[graft.expressions.TopKAgg.top_k_ids]] k=1, whose (score DESC,
    * id ASC) order IS the census tiebreak (see
    * [[overlapCensusReduce]] for the rejected window / max_by
    * shapes). */
  private def containmentCensusReduce(pairs: DataFrame): DataFrame = {
    val perDir = pairs.select(explode(array(
        struct(col("id_a").as("id"), col("id_b").as("partner"),
          col("cont_a_in_b").as("c_in_partner")),
        struct(col("id_b").as("id"), col("id_a").as("partner"),
          col("cont_b_in_a").as("c_in_partner")))).as("e"))
      .select(col("e.id").as("id"), col("e.partner").as("partner"),
        col("e.c_in_partner").as("c_in_partner"))
    perDir.groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_partners"),
        max("c_in_partner").as("c_max"),
        graft.expressions.TopKAgg.top_k_ids(
          col("c_in_partner"), col("partner").cast("long"), 1)
          .getItem(0).getField("id").as("top_partner"))
  }

  /** Rarity-weighted set-overlap join (IDF-style without the libm
    * log): each shared item contributes `1e6 div df(item)` micro-units
    * (BIGINT — exact, order-free sums), so one rare shared shingle
    * outweighs many boilerplate ones. The unweighted intersection
    * count treats "the quick brown" and a unique quote as equal
    * evidence; this operator is the cheap fix when a full df-cut is
    * too blunt. Returns (id_a, id_b, inter, w_overlap) with
    * w_overlap ≥ `minWeight`.
    *
    * 100 TB shape: identical to [[jaccardSimJoinOn]] — token-keyed
    * shuffle; the df table joins the inverted index ON THE TOKEN KEY
    * it is already partitioned by. High-df tokens self-limit here
    * (weight → 0) but still cost candidate rows — `maxDocFrequency`
    * applies the same lazy df-cut as the sibling joins when posting
    * lists are hot (weights then come from the surviving tokens'
    * unchanged df). */
  def weightedOverlapJoinOn(df: DataFrame, id: Column, items: Column,
                            minWeight: Long,
                            maxDocFrequency: Double = 1.0): DataFrame = {
    val toks = df.select(id.as("id"), array_distinct(items).as("toks"))
    val inv = invertedIndex(toks, maxDocFrequency)
    val wInv = inv.join(
      inv.groupBy("tok").agg(count(lit(1)).as("__df")), "tok")
      .select(col("id"), col("tok"),
        expr("CAST(1000000 AS BIGINT) div __df").as("w"))
    wInv.alias("a")
      .join(wInv.alias("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"), sum(col("a.w")).as("w_overlap"))
      .filter(col("w_overlap") >= minWeight)
      .select(col("id_a"), col("id_b"), col("inter"), col("w_overlap"))
  }

  /** Per-document census over the rarity-weighted overlap join — the
    * count-first scale path next to [[weightedOverlapJoinOn]]'s pair
    * list (the q195→q210 pattern applied to q122): the pair list's
    * size IS its answer, so at corpus scale the census is what ships —
    * one row per document having ≥1 partner at `minWeight`, carrying
    * the partner count, the strongest overlap weight, and the
    * deterministic top partner (highest w_overlap, ties to the lower
    * id). The pair aggregation itself is unchanged (token-keyed
    * shuffle, map-side combine); what disappears is the answer-sized
    * sorted pair output — the census reduces per doc id in one more
    * keyed shuffle, and its window partitions per doc (bounded by
    * partner count, never corpus-sized).
    *
    * DEFAULT PAIR SOURCE: when no df-cut is requested
    * (`maxDocFrequency ≥ 1.0`), the pairs come from
    * [[prefixFilterWeightedOverlapJoinOn]] — provably identical
    * output, but the candidate plan prunes on weight mass instead of
    * aggregating every hot posting list (sf1/2 GiB: 24 MB spill vs the
    * plain join's 3.5 GB). At 100× a census caller should get that
    * plan without opting in. `plainPairs = true` forces the plain
    * inverted-index join (the adjudicated q122-class demo path); a
    * df-cut (`maxDocFrequency < 1.0`) also keeps the plain path,
    * because the cut is SEMANTIC — it changes which pairs exist (and
    * re-prices df on the survivors), and the prefix filter reproduces
    * the UNCUT join only. */
  def weightedOverlapCensus(df: DataFrame, id: Column, items: Column,
                            minWeight: Long,
                            maxDocFrequency: Double = 1.0,
                            plainPairs: Boolean = false): DataFrame =
    overlapCensusReduce(
      if (!plainPairs && maxDocFrequency >= 1.0)
        prefixFilterWeightedOverlapJoinOn(df, id, items, minWeight)
      else weightedOverlapJoinOn(df, id, items, minWeight, maxDocFrequency))

  /** [[weightedOverlapCensus]] over the EXACT prefix-filtered join —
    * the count-first scale path whose pair source is
    * [[prefixFilterWeightedOverlapJoinOn]] (provably ≡ the plain
    * join), so the census inherits the prefix scheme's near-zero-spill
    * candidate plan instead of the plain join's hot-posting-list
    * intersection aggregation (q222's 2.1 GB sf1 spill shape). Same
    * census semantics and reduction, shared by construction. */
  def prefixFilterWeightedOverlapCensus(df: DataFrame, id: Column,
                                        items: Column,
                                        minWeight: Long): DataFrame =
    overlapCensusReduce(
      prefixFilterWeightedOverlapJoinOn(df, id, items, minWeight))

  /** The census reduction shared by [[weightedOverlapCensus]] and
    * [[prefixFilterWeightedOverlapCensus]] — factored so the demo and
    * its scale twin cannot drift. Both directions via ONE explode (a
    * unionAll of two selects over `pairs` would duplicate the whole
    * pair-building lineage); the reduction is ONE hash aggregate —
    * the top partner rides [[graft.expressions.TopKAgg.top_k_ids]]
    * with k=1 (score DESC, id ASC: exactly the census tiebreak), a
    * TypedImperativeAggregate so the whole node plans as
    * ObjectHashAggregate WITH map-side partial aggregation. The two
    * rejected shapes, both measured (BENCH_NOTES r13 census-reduce
    * A/B): a per-id row_number window (exchange + full sort, NO
    * map-side combine), and `max_by` over a (metric, -partner) struct
    * (partial-aggregable but the struct buffer forces SortAggregate,
    * whose local sort pipelines into the verification stage and
    * squeezes its joins into spill at tight heaps). The BIGINT
    * w_overlap is scored as double: exact to 2^53 micro-units — item
    * weights are ≤ 1e6 each, so an intersection would need 9e9 items
    * before two distinct overlaps could collide. */
  private def overlapCensusReduce(pairs: DataFrame): DataFrame = {
    val perDir = pairs.select(explode(array(
        struct(col("id_a").as("id"), col("id_b").as("partner"),
          col("w_overlap")),
        struct(col("id_b").as("id"), col("id_a").as("partner"),
          col("w_overlap")))).as("e"))
      .select(col("e.id").as("id"), col("e.partner").as("partner"),
        col("e.w_overlap").as("w_overlap"))
    perDir.groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_partners"),
        max("w_overlap").as("w_max"),
        graft.expressions.TopKAgg.top_k_ids(
          col("w_overlap").cast("double"), col("partner").cast("long"), 1)
          .getItem(0).getField("id").as("top_partner"))
  }

  /** Shared inverted-index candidate builder: (id_a, id_b, inter,
    * sz_a, sz_b) for every pair of documents sharing ≥1 surviving
    * item. The shuffle key is the item; the per-doc size table joins
    * back by PLAIN shuffle (O(n_docs) rows — broadcasting it would OOM
    * at corpus scale). */
  /** Guarded inverted index (id, tok) over a (id, toks) relation, with
    * the optional lazy document-frequency cut — shared by every
    * token-keyed sim-join so the posting-list guard composes
    * uniformly. */
  /** Prefix-filtered EXACT Jaccard set-similarity join (the AllPairs /
    * PPJoin candidate scheme — Bayardo et al. WWW'07, Xiao et al.
    * WWW'08). Unlike the df-cut (a lossy stop-token trade that reports
    * a LOWER BOUND), the prefix filter is exact-complete: order every
    * document's items by ascending global document frequency (rarest
    * first, ties on the item value) and index only the first
    * `sz - floor(t·sz) + 1` items. Any pair with Jaccard ≥ t must share
    * at least one indexed prefix item — J ≥ t implies
    * |A∩B| ≥ t·|A∪B| ≥ t·|A|, so skipping more than `sz - ceil(t·sz)`
    * items of A cannot leave enough overlap. The required-overlap bound
    * uses integer FLOOR in micro-units (longer prefix than strictly
    * needed), so the 6-dp rounding of the final Jaccard check can never
    * drop a true pair.
    *
    * 100 TB shape: the candidate self-join's shuffle key is the PREFIX
    * item — by construction each doc contributes only its RAREST items,
    * so the hottest posting lists (the exact rows the df-cut has to
    * throw away) never enter the join, yet the result is provably equal
    * to the all-pairs inverted-index join. Verification touches only
    * candidate pairs: one join back to the per-doc item arrays and an
    * `array_intersect` per pair, O(|A|+|B|) each. The per-doc
    * rarest-first ranking window partitions on doc id (bounded by doc
    * size, never corpus-sized). Returns (id_a, id_b, jaccard) —
    * identical to [[jaccardSimJoinOn]] with no df-cut. */
  def prefixFilterJaccardJoinOn(df: DataFrame, id: Column, items: Column,
                                threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val tMicro = math.round(threshold * 1e6)
    // sort_array once per DOC buys the allocation-free merge-intersect
    // once per candidate PAIR (SortedIntersectAtLeast's precondition;
    // sort_array's StringType order IS UTF8String's binary comparator).
    val toks = df.select(id.as("id"), sort_array(array_distinct(items)).as("toks"))
      .withColumn("sz", size(col("toks")).cast("long"))
      .filter(col("sz") > 0)
    val prefix = rarestFirstPrefix(toks, tMicro)
    // Candidate pairs: prefix-item equi-join + the (conservative,
    // micro-unit-exact) length filter min ≥ (t − ε)·max.
    val cand = prefix.alias("a")
      .join(prefix.alias("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")) * lit(1000000L) >=
            lit(tMicro - 1L) * greatest(col("a.sz"), col("b.sz")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // Exact verification on candidates only: merge-intersect with the
    // early-exit lower bound. A pair passes the final 6-dp check only
    // if round(i/(sa+sb−i), 6) ≥ t, which needs i/(sa+sb−i) ≥
    // (tMicro−1)/1e6, i.e. i·(1e6+tMicro−1) ≥ (tMicro−1)·(sa+sb) — so
    // i < ⌊(tMicro−1)(sa+sb)/(1e6+tMicro)⌋ cannot pass (the divisor is
    // rounded UP to 1e6+tMicro, weakening the bound: FLOOR-safe, the
    // sentinel −1 never drops a true pair).
    cand
      .join(toks.select(col("id").as("id_a"), col("toks").as("__ta"),
        col("sz").as("__sa")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("toks").as("__tb"),
        col("sz").as("__sb")), "id_b")
      .withColumn("__i", graft.expressions.SortedIntersect.sorted_intersect_at_least(
        col("__ta"), col("__tb"),
        expr(s"(CAST(${tMicro - 1L} AS BIGINT) * (__sa + __sb)) div ${1000000L + tMicro}")))
      .filter(col("__i") >= 0L)
      .withColumn("jaccard",
        round(col("__i").cast("double") / (col("__sa") + col("__sb") - col("__i")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Prefix-filtered EXACT containment join — [[prefixFilterJaccardJoinOn]]'s
    * candidate scheme extended to the asymmetric containment bound:
    * identical output to [[containmentJoinOn]] with NO df-cut (the
    * exact-complete counterpart of q119's lossy lower-bound trade,
    * exactly as q211 is to q96). A pair qualifies when
    * max(|A∩B|/|A|, |A∩B|/|B|) ≥ t, i.e. |A∩B| ≥ t·min(|A|,|B|) — so
    * only the SMALLER side's size bounds the required overlap, and the
    * prefix argument runs one-sided: rank the contained side's items
    * rarest-first and keep `sz − ⌈t·sz⌉ + 1` of them; if a qualifying
    * pair shared nothing in that prefix, all shared items would sit in
    * a suffix smaller than the required overlap — contradiction. The
    * bigger side cannot be prefix-trimmed (its required overlap depends
    * on the PARTNER's size, unknown at index time), so candidates come
    * from prefix(contained) ⋈ FULL postings(container), constrained to
    * sz_prefix ≤ sz_full. The required-overlap bound uses integer FLOOR
    * at `tMicro − 1` micro-units (a slightly longer prefix than
    * strictly needed), so the 6-dp rounding of the final containment
    * check can never drop a true pair.
    *
    * 100 TB shape: the shuffle key is the token on both sides; the
    * posting-list blow-up risk sits only in the JOIN OUTPUT for hot
    * tokens, and a hot token (highest df) is by construction the LAST
    * candidate for any doc's rarest-first prefix — it only enters when
    * a doc is so small (or t so low) that its prefix is the whole doc.
    * Verification touches candidate pairs only: one join back to the
    * per-doc arrays, `array_intersect` per pair. */
  def prefixFilterContainmentJoinOn(df: DataFrame, id: Column, items: Column,
                                    threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val tMicro = math.round(threshold * 1e6)
    // sort_array once per DOC buys the allocation-free merge-intersect
    // once per candidate PAIR (SortedIntersectAtLeast's precondition;
    // sort_array's StringType order IS UTF8String's binary comparator).
    val toks = df.select(id.as("id"), sort_array(array_distinct(items)).as("toks"))
      .withColumn("sz", size(col("toks")).cast("long"))
      .filter(col("sz") > 0)
    val prefix = rarestFirstPrefix(toks, tMicro - 1)
    val full = toks.select(col("id"), col("sz"), explode(col("toks")).as("tok"))
    val cand = prefix.alias("a")
      .join(full.alias("b"),
        col("a.tok") === col("b.tok") && col("a.id") =!= col("b.id") &&
          col("a.sz") <= col("b.sz"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    // Exact verification on candidates only: merge-intersect with the
    // early-exit lower bound. A pair passes the final 6-dp check only
    // if max(round(i/sa,6), round(i/sb,6)) ≥ t, which needs
    // i/min(sa,sb) ≥ (tMicro−1)/1e6 — so i <
    // ⌊(tMicro−1)·min(sa,sb)/1e6⌋ cannot pass (FLOOR-safe: the
    // sentinel −1 only ever removes provably-failing pairs; the 2.33M
    // sf1 candidates for an 1,800-pair answer abort their merges after
    // ~(1−t)·min(sz) comparisons instead of hashing the full arrays).
    cand
      .join(toks.select(col("id").as("id_a"), col("toks").as("__ta"),
        col("sz").as("__sa")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("toks").as("__tb"),
        col("sz").as("__sb")), "id_b")
      .withColumn("inter", graft.expressions.SortedIntersect.sorted_intersect_at_least(
        col("__ta"), col("__tb"),
        expr(s"(CAST(${tMicro - 1L} AS BIGINT) * least(__sa, __sb)) div 1000000")))
      .filter(col("inter") >= 0L)
      .withColumn("cont_a_in_b", round(col("inter").cast("double") / col("__sa"), 6))
      .withColumn("cont_b_in_a", round(col("inter").cast("double") / col("__sb"), 6))
      .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"),
        col("__sa").as("sz_a"), col("__sb").as("sz_b"),
        col("cont_a_in_b"), col("cont_b_in_a"))
  }

  /** Prefix-filtered EXACT rarity-weighted overlap join —
    * [[prefixFilterJaccardJoinOn]]'s candidate scheme extended to the
    * WEIGHTED overlap bound: identical output to
    * [[weightedOverlapJoinOn]] with no df-cut. The prefix argument
    * runs on weight mass instead of item count: order every document's
    * items by DESCENDING weight (w = 1e6 div df, ties on the item
    * value — a total order CONSISTENT across documents because both
    * keys are global properties of the item) and keep an item iff the
    * weight sum from its rank to the end of the document is ≥
    * `minWeight`. Completeness: for any qualifying pair let t* be the
    * globally-heaviest shared item; every shared item ranks at or
    * after t* on BOTH sides, so each side's tail sum at t* is ≥ the
    * pair's total shared weight ≥ minWeight — t* is in both prefixes
    * and the pair collides in the prefix⋈prefix join. All weights are
    * exact BIGINT micro-units, so there is no rounding to guard.
    *
    * 100 TB shape: the candidate join's shuffle key is the prefix
    * item, and the pruned suffix is exactly the LIGHTEST items — the
    * high-df boilerplate whose posting lists blow up the plain
    * inverted-index self-join ([[weightedOverlapJoinOn]]'s q122 spill
    * shape). A hot item enters a doc's prefix only when the doc's
    * remaining weight mass past it still clears minWeight — rare for
    * real corpora where hot items carry micro-weights. Verification
    * touches candidate pairs only: one row per pair through two
    * doc-keyed joins (side A a map<item,weight>, side B its item
    * array — the weight is a global property of the item, so one
    * side's map prices the whole intersection), exact BIGINT sums,
    * and the same final `w_overlap ≥ minWeight` gate as the plain
    * join. */
  def prefixFilterWeightedOverlapJoinOn(df: DataFrame, id: Column,
                                        items: Column,
                                        minWeight: Long): DataFrame = {
    require(minWeight > 0L, s"minWeight must be positive, got $minWeight")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(id.as("id"), array_distinct(items).as("toks"))
    val inv = toks.select(col("id"), explode(col("toks")).as("tok"))
    val wInv = inv.join(
      inv.groupBy("tok").agg(count(lit(1)).as("__df")), "tok")
      .select(col("id"), col("tok"),
        expr("CAST(1000000 AS BIGINT) div __df").as("w"))
    // heaviest-first prefix: tail sum (this item + everything lighter
    // in the same doc) must still reach minWeight. Window partitions
    // per doc id — bounded by doc size, never corpus-sized.
    val byWeight = Window.partitionBy(col("id"))
      .orderBy(col("w").desc, col("tok").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prefix = wInv
      .withColumn("__tail", sum(col("w")).over(byWeight))
      .filter(col("__tail") >= minWeight)
      .select(col("id"), col("tok"))
    val cand = prefix.alias("a")
      .join(prefix.alias("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // Exact verification on candidates only, PER-PAIR (the q234
    // containment-verification shape, weighted): side A carries a
    // map<item,weight>, side B only its item array — the weight is a
    // GLOBAL property of the item (1e6 div df), so one side's map
    // prices the whole intersection. Each candidate is ONE row through
    // two doc-keyed joins and a codegen'd aggregate() over
    // array_intersect — no exploded candidates×|doc| fan-out and no
    // pair-keyed hash aggregate (the old form's third shuffle, which
    // at sf1 pushed hundreds of millions of (pair, item) rows and was
    // most of q235's runtime; A/B in BENCH_NOTES round 13). Exactness
    // unchanged: BIGINT micro-unit sums, map keys unique per doc
    // (array_distinct upstream).
    val wa = wInv.groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("tok"), col("w"))))
        .as("__wm"))
      .select(col("id").as("id_a"), col("__wm"))
    val wb = toks.select(col("id").as("id_b"), col("toks").as("__tb"))
    cand.join(wa, "id_a")
      .join(wb, "id_b")
      .withColumn("__shared", array_intersect(map_keys(col("__wm")), col("__tb")))
      .withColumn("inter", size(col("__shared")).cast("long"))
      .withColumn("w_overlap", expr(
        "aggregate(__shared, CAST(0 AS BIGINT), (acc, t) -> acc + element_at(__wm, t))"))
      .filter(col("w_overlap") >= minWeight)
      .select(col("id_a"), col("id_b"), col("inter"), col("w_overlap"))
  }

  /** The prefix index for [[prefixFilterJaccardJoinOn]]: per doc, items
    * ranked rarest-first (global df ascending, ties on value), keeping
    * rank ≤ sz - floor(t·sz) + 1. Package-visible so specs can assert
    * the pruning ratio directly. Input: (id, toks, sz). */
  private[graft] def rarestFirstPrefix(toks: DataFrame, tMicro: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inv = toks.select(col("id"), col("sz"), explode(col("toks")).as("tok"))
    val dfreq = inv.groupBy("tok").agg(count(lit(1)).as("__df"))
    val byRarity = Window.partitionBy(col("id")).orderBy(col("__df"), col("tok"))
    inv.join(dfreq, "tok")
      .withColumn("__rn", row_number().over(byRarity))
      .filter(col("__rn") <= col("sz") - expr(s"($tMicro * sz) div 1000000") + 1)
      .select(col("id"), col("sz"), col("tok"))
  }

  /** Sample-calibrated LSH operating-point planner: choose (bands,
    * rows) for the 64-hash MinHash banding from the corpus's OWN
    * pair-similarity distribution instead of folklore defaults — the
    * census-drives-the-plan discipline ([[Ivf.autoNlist]],
    * `Ivf.tuneNprobe`, `skewJoinDecision`) applied to near-dup
    * banding. A deterministic md5-ordered sample of `sampleSize` docs
    * supplies candidate pairs (inverted-index join on shared items, so
    * only pairs with Jaccard > 0 appear — zero-similarity pairs have
    * zero collision probability and zero miss cost by definition); for
    * every divisor split b×r = 64 the S-curve collision probability
    * P(s) = 1 − (1 − s^r)^b prices the sample: expected false-positive
    * cost = Σ_{s<t} P(s), expected miss cost = Σ_{s≥t} (1 − P(s)),
    * chosen flags every cost-minimal split of cost = fp + fnWeight·fn
    * (on a tie, take the flagged row with the fewest bands — cheapest
    * join).
    *
    * Cross-engine exactness: every power is an explicit SQUARING CHAIN
    * (r and b are powers of two), never `pow()` — repeated IEEE
    * multiplication is bit-identical in both engines where a libm
    * `pow` is only 1-ulp-correct; P micronizes to BIGINT before the
    * order-free sums. 100 TB shape: the sample is 48 docs regardless
    * of corpus size (one TakeOrdered), pairs are sample-bounded, and
    * the 7-candidate grid is a 1-row aggregate — the planner costs
    * less than one banding round of the join it tunes. */
  def lshBandPlan(df: DataFrame, id: Column, items: Column,
                  threshold: Double, sampleSize: Int = 48,
                  fnWeight: Long = 3L, seed: Long = 42L,
                  itemsNonEmpty: Option[Column] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    planFromPairSims(samplePairSims(df, id, items, sampleSize, seed,
        itemsNonEmpty),
      math.round(threshold * 1e6), fnWeight)
  }

  /** The planner's sampled evidence: Jaccard similarities of every
    * shared-item pair inside a deterministic md5-ordered sample of
    * `sampleSize` docs — (s, sm = round(s·10⁶)). Shared by
    * [[lshBandPlan]] (one corpus) and [[lshPlanDrift]] (corpus vs
    * ingest batch, each priced on its OWN distribution). */
  private def samplePairSims(df: DataFrame, id: Column, items: Column,
                             sampleSize: Int, seed: Long,
                             itemsNonEmpty: Option[Column] = None): DataFrame = {
    val key = conv(substring(md5(concat(id.cast("string"), lit("|" + seed))),
      1, 8), 16, 10).cast("long")
    // two-phase sample: the corpus-wide pass carries only (id, key) —
    // the distinct-item arrays are built AFTER the 48-row cut, behind
    // the broadcast semi-join, so nothing array-sized rides the
    // TakeOrdered (size(items) > 0 ⇔ the distinct array is non-empty).
    // `itemsNonEmpty`, when given, is a caller-proved CHEAP equivalent
    // of that predicate (e.g. size(tokens) >= 3 for word-3-gram items):
    // the corpus-wide eligibility pass then never builds the item
    // arrays at all — at 100 TB this pass is a full corpus scan and the
    // gram-array construction roughly doubles its per-row cost. The
    // default stays the exact array predicate.
    val sampleIds = df.filter(itemsNonEmpty.getOrElse(size(items) > 0))
      .select(id.as("__sid"), key.as("__k"))
      .orderBy(col("__k"), col("__sid")).limit(sampleSize)
      .select("__sid")
    val sample = df.join(broadcast(sampleIds), id === col("__sid"))
      .select(id.as("id"), array_distinct(items).as("toks"))
    val w = sample.select(col("id"), explode(col("toks")).as("tok"))
    val sz = sample.select(col("id"), size(col("toks")).cast("long").as("sz"))
    val inter = w.alias("a")
      .join(w.alias("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sz.select(col("id").as("id_a"), col("sz").as("sa")), "id_a")
      .join(sz.select(col("id").as("id_b"), col("sz").as("sb")), "id_b")
      .select(round(col("i").cast("double") /
        (col("sa") + col("sb") - col("i")), 6).as("s"))
      .withColumn("sm", round(col("s") * 1e6).cast("long"))
  }

  /** The 64-hash divisor grid and its S-curve cost sums — shared by
    * [[lshBandPlan]]'s global aggregate and [[lshPlanDrift]]'s
    * side-grouped aggregate so the two price identically by
    * construction. */
  private val BandGrid = Seq(1, 2, 4, 8, 16, 32, 64).map(b => (b, 64 / b))

  private def gridSumCols(tMicro: Long): Seq[Column] = {
    def chain(c0: Column, e: Int): Column = {
      var c = c0; var k = 1
      while (k < e) { c = c * c; k *= 2 }
      c
    }
    BandGrid.flatMap { case (b, r) =>
      val p = lit(1.0) - chain(lit(1.0) - chain(col("s"), r), b)
      val pm = round(p * 1e6).cast("long")
      Seq(
        coalesce(sum(when(col("sm") < tMicro, pm).otherwise(0L)), lit(0L))
          .as(s"fp_$b"),
        coalesce(sum(when(col("sm") >= tMicro, lit(1000000L) - pm)
          .otherwise(0L)), lit(0L)).as(s"fn_$b"))
    }
  }

  private def gridExplode(fnWeight: Long): Column =
    explode(array(BandGrid.map { case (b, r) =>
      struct(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
        col(s"fp_$b").as("fp_micro"), col(s"fn_$b").as("fn_micro"),
        (col(s"fp_$b") + lit(fnWeight) * col(s"fn_$b")).as("cost_micro"))
    }: _*))

  /** Price every divisor split b×r = 64 on a (s, sm) pair sample and
    * flag the cost-minimal rows: (bands, rows_per_band, fp_micro,
    * fn_micro, cost_micro, chosen). */
  private def planFromPairSims(pairs: DataFrame, tMicro: Long,
                               fnWeight: Long): DataFrame = {
    val sums = gridSumCols(tMicro)
    val agg = pairs.agg(sums.head, sums.tail: _*)
    val rows = agg.select(gridExplode(fnWeight).as("c")).select("c.*")
    // chosen via a global window over the 7-row grid — one operator on
    // an already-single-partition frame, replacing a separate min
    // aggregate + broadcast cross-join (one fewer broadcast exchange
    // and its build job in every planner call)
    rows.withColumn("chosen", col("cost_micro") ===
      min(col("cost_micro")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
  }

  /** Re-price the banding choice against an ingest batch — the
    * census-drives-the-plan discipline [[lshBandPlan]] applies at plan
    * time, carried into the incremental path the way `AnnIngest`
    * composes `Ivf.ingestCensus`: the corpus's plan was calibrated on
    * the corpus's own pair-similarity distribution, and a drifted
    * batch (say, a re-crawl full of near-duplicates) can move the
    * cost-minimal operating point. Both sides are priced on their OWN
    * md5 sample with the same grid, threshold and weights; the output
    * is ONE frame per candidate split with the planner verdicts side
    * by side plus the sampled-pair census that justifies them:
    *
    *   (bands, rows_per_band,
    *    corpus_fp_micro, corpus_fn_micro, corpus_cost_micro, corpus_chosen,
    *    batch_fp_micro,  batch_fn_micro,  batch_cost_micro,  batch_chosen,
    *    corpus_pairs, corpus_pairs_ge_t, batch_pairs, batch_pairs_ge_t,
    *    plan_changed)
    *
    * `plan_changed` (same value on every row — the frame-level flag a
    * maintainer alerts on) is true iff NO corpus-chosen split is still
    * batch-chosen: a tie that keeps the shipped point optimal does not
    * flip the plan. 100 TB shape: two 48-doc samples, two 1-row
    * aggregates, a 7-row join — re-pricing costs less than one banding
    * round of the join it tunes, so it can run on every batch. */
  def lshPlanDrift(corpus: DataFrame, batch: DataFrame, id: Column,
                   items: Column, threshold: Double, sampleSize: Int = 48,
                   fnWeight: Long = 3L, seed: Long = 42L,
                   itemsNonEmpty: Option[Column] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val tMicro = math.round(threshold * 1e6)
    // ONE union-tagged pass: the round-8 form priced each side's
    // sample-pair chain twice (plan aggregate + census aggregate), so
    // the TakeOrdered + self-join sampler executed FOUR times per
    // call; fusing plan and census into one side-grouped aggregate
    // over the tagged union runs each sampler once (measured ~2.5×
    // on q216 and on every BandPlanMaintainer batch). Values are
    // identical by construction — the same gridSumCols price both
    // forms.
    def tagged(df: DataFrame, side: String): DataFrame =
      samplePairSims(df, id, items, sampleSize, seed, itemsNonEmpty)
        .withColumn("__side", lit(side))
    val pairs = tagged(corpus, "corpus").unionByName(tagged(batch, "batch"))
    val sums = gridSumCols(tMicro) ++ Seq(
      count(lit(1)).cast("long").as("__pairs"),
      coalesce(sum(when(col("sm") >= tMicro, 1L).otherwise(0L)), lit(0L))
        .as("__pairs_ge_t"))
    val aggd = pairs.groupBy("__side").agg(sums.head, sums.tail: _*)
    // a side whose sample yields ZERO shared-item pairs drops out of
    // the grouped aggregate — re-seat it with the global-agg zeros the
    // round-8 per-side form produced. The 2-row frame is then EAGERLY
    // localCheckpoint'ed (the q195 discipline): everything downstream
    // references it three times (per-side min, the chosen join, the
    // two side splits), and without the barrier each reference replays
    // BOTH samplers — the exact multiple-execution this fusion exists
    // to remove. Two rows × 16 ints; model-sized like an IVF centroid
    // collect.
    val full = corpus.sparkSession.range(1)
      .select(explode(array(lit("corpus"), lit("batch"))).as("__side"))
      .join(aggd, Seq("__side"), "left").na.fill(0L)
      .localCheckpoint(true)
    val rows = full
      .select(col("__side"), col("__pairs"), col("__pairs_ge_t"),
        gridExplode(fnWeight).as("c"))
      .select(col("__side"), col("c.*"), col("__pairs"), col("__pairs_ge_t"))
    // 14-row tail, restructured from agg+broadcast-join+filter+self-
    // join+agg+cross-join (r13) to window → grouped pivot → window:
    // `chosen` is a per-side window min, the side split is ONE pivot
    // aggregate over (bands, rows_per_band) — each (side, split) holds
    // exactly one row, so min(when(side=..)) IS that row's value — and
    // `plan_changed` is a global window max. Same values by
    // construction; the r13 tail planned ~10 extra single-row stages
    // (two broadcast builds, a self-join, a cross-join) per call.
    val wSide = org.apache.spark.sql.expressions.Window.partitionBy("__side")
    val flagged = rows.withColumn("chosen",
      col("cost_micro") === min(col("cost_micro")).over(wSide))
    def sideAggs(p: String): Seq[Column] = Seq(
      min(when(col("__side") === p, col("fp_micro"))).as(s"${p}_fp_micro"),
      min(when(col("__side") === p, col("fn_micro"))).as(s"${p}_fn_micro"),
      min(when(col("__side") === p, col("cost_micro"))).as(s"${p}_cost_micro"),
      min(when(col("__side") === p, col("chosen"))).as(s"${p}_chosen"),
      min(when(col("__side") === p, col("__pairs"))).as(s"${p}_pairs"),
      min(when(col("__side") === p, col("__pairs_ge_t")))
        .as(s"${p}_pairs_ge_t"))
    val aggs = sideAggs("corpus") ++ sideAggs("batch")
    val joined = flagged.groupBy(col("bands"), col("rows_per_band"))
      .agg(aggs.head, aggs.tail: _*)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    joined
      .withColumn("plan_changed",
        coalesce(max(when(col("corpus_chosen") && col("batch_chosen"), 1L)
          .otherwise(0L)).over(wAll), lit(0L)) === 0L)
      // round-8 column order, so the frame is a drop-in
      .select(col("bands"), col("rows_per_band"),
        col("corpus_fp_micro"), col("corpus_fn_micro"),
        col("corpus_cost_micro"), col("corpus_chosen"),
        col("batch_fp_micro"), col("batch_fn_micro"),
        col("batch_cost_micro"), col("batch_chosen"),
        col("corpus_pairs"), col("corpus_pairs_ge_t"),
        col("batch_pairs"), col("batch_pairs_ge_t"),
        col("plan_changed"))
  }

  private def invertedIndex(toks: DataFrame,
                            maxDocFrequency: Double): DataFrame = {
    val invAll = toks.select(col("id"), explode(col("toks")).as("tok"))
    if (maxDocFrequency >= 1.0) invAll
    else {
      // the cut threshold stays LAZY: a 1-row corpus-count aggregate
      // broadcast-cross-joined into the hot-token filter, so the cut
      // adds zero extra passes over the corpus (an eager df.count()
      // here would be one full scan per call at 100 TB)
      val cutRow = toks.agg(greatest(lit(1L),
        (lit(maxDocFrequency) * count(lit(1))).cast("long")).as("__cut"))
      val hot = invAll.groupBy(col("tok")).agg(count(lit(1)).as("__df"))
        .crossJoin(broadcast(cutRow))
        .filter(col("__df") > col("__cut"))
      // the drop COUNT is an extra job, so it runs only at DEBUG — at
      // the default INFO level the cut (anti-join below) stays lazy/fused
      // and costs zero extra passes over the token-frequency table
      if (log.isDebugEnabled) {
        val nHot = hot.count()
        log.debug(s"invertedIndex df-cut: dropping $nHot tokens with " +
          s"doc-frequency fraction > $maxDocFrequency")
      }
      invAll.join(hot.select(col("tok").as("__hot")),
        col("tok") === col("__hot"), "left_anti")
    }
  }

  private def intersectionPairs(df: DataFrame, id: Column, items: Column,
                                maxDocFrequency: Double): DataFrame = {
    val toks = df.select(id.as("id"), array_distinct(items).as("toks"))
    val sizes = toks.select(col("id"), size(col("toks")).as("sz"))
    val inv = invertedIndex(toks, maxDocFrequency)
    val pairs = inv.alias("a")
      .join(inv.alias("b"), col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnsRenamed(Map("id" -> "__ia", "sz" -> "sz_a")),
        col("id_a") === col("__ia"))
      .join(sizes.withColumnsRenamed(Map("id" -> "__ib", "sz" -> "sz_b")),
        col("id_b") === col("__ib"))
      .select(col("id_a"), col("id_b"), col("inter"), col("sz_a"), col("sz_b"))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // crafted corpus: 0≡1 identical, 2 near-dup of 0 (one token changed),
  // 3 unrelated, 4 near-dup of 3
  lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy cat again and again today"),
    (3L, "completely different content about spark query engines at scale now"),
    (4L, "completely different content about spark query engines at scale here")
  ).toDF("doc_id", "text")

  test("exact dup groups find the identical pair, deterministically") {
    val g = Dedup.exactDupGroups(docs, col("doc_id"), col("text")).collect()
    assert(g.length === 1)
    assert(g.head.getAs[Seq[Long]]("doc_ids") === Seq(0L, 1L))
  }

  test("dropExactDups keeps min-id representative") {
    val kept = Dedup.dropExactDups(docs, col("doc_id"), col("text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 2L, 3L, 4L))
  }

  test("jaccardSimJoin computes exact token-set jaccard") {
    val pairs = Dedup.jaccardSimJoin(docs, col("doc_id"), col("text"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) === 1.0)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) < 1.0)
    assert(pairs.contains((3L, 4L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("minhash LSH candidates contain every true high-jaccard pair") {
    val cand = Dedup.minhashCandidates(docs, col("doc_id"), col("text"),
      numHashes = 64, shingleSize = 2, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((0L, 1L)))
    assert(cand.contains((0L, 2L)) || cand.contains((1L, 2L)))
    assert(cand.contains((3L, 4L)))
  }

  test("minhashNearDups verifies candidates with exact jaccard") {
    val nd = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
      threshold = 0.99, shingleSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd === Set((0L, 1L))) // only the identical pair survives 0.99
  }

  test("minhash signature is deterministic across plans") {
    val s1 = Dedup.withMinhashSignature(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val s2 = Dedup.withMinhashSignature(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(s1 === s2)
    assert(s1(0L) === s1(1L)) // identical docs → identical signatures
    assert(s1(0L) !== s1(3L))
  }

  test("simhash: identical docs same signature; near-dups within hamming 3") {
    val pairs = Dedup.simhashNearDups(docs, col("doc_id"), col("text"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 3L)))
  }

  test("native MinHashSignature ≡ column-algebra form on real documents") {
    val real = Tables.load(spark, TestSpark.sf0001, "documents")
    val h32 = Dedup.shingleHashes32(col("text"), 3)
    val native = Dedup.withMinhashSignature(real, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val algebra = real
      .select(col("doc_id"), h32.as("__h32"))
      .select(col("doc_id"), Dedup.minhashSignatureHof(col("__h32"), 64, 42L).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === algebra)
  }

  test("native SimHash64 ≡ column-algebra form on real documents") {
    val real = Tables.load(spark, TestSpark.sf0001, "documents")
    val both = real.select(
      Dedup.simhash64(col("text")).as("native"),
      Dedup.simhash64Hof(col("text")).as("algebra"))
      .filter(col("native") =!= col("algebra")).count()
    assert(both === 0L)
  }

  test("shingleHashes: short docs yield empty shingle arrays (no crash)") {
    val short = Seq((0L, "one two"), (1L, ""), (2L, "a b c d")).toDF("doc_id", "text")
    val sizes = short.select(size(TextAnalysis.shingleHashes(col("text"), 3)))
      .collect().map(_.getInt(0)).toSeq
    assert(sizes === Seq(0, 0, 2))
  }

  test("shingleHashes: n-gram count = tokens − n + 1") {
    val n = docs.filter(col("doc_id") === 0)
      .select(size(TextAnalysis.shingleHashes(col("text"), 3))).head().getInt(0)
    val toks = docs.filter(col("doc_id") === 0)
      .select(size(TextAnalysis.tokens(col("text")))).head().getInt(0)
    assert(n === toks - 2)
  }

  test("keepCanonical: one survivor per duplicate component, others untouched") {
    import spark.implicits._
    val docsDf = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Dedup.keepCanonical(docsDf, col("id"), pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 10L, 99L))
  }

  test("connectedComponents: chain, clique and isolated pair get min-id labels") {
    import spark.implicits._
    // chain 1-2-3-4, clique 10-11-12, pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(edges, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("jaccardSimJoin never broadcasts the per-doc size table") {
    // the r2 verdict's scale bug: broadcast(sizes) is O(n_docs) per
    // executor. Pin the fix at the plan level — no broadcast hint may
    // survive in the optimized plan (AQE may still choose broadcast for
    // a genuinely tiny side at runtime; the HINT was the bug).
    val plan = Dedup.jaccardSimJoin(docs, col("doc_id"), col("text"), 0.5)
      .queryExecution.optimizedPlan
    val hints = plan.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, s"unexpected broadcast hint in:\n$plan")
  }

  test("df-cut drops only high-frequency tokens and keeps exact jaccard for survivors") {
    import spark.implicits._
    // 6 docs sharing the token "common"; pairs (1,2) and (3,4) also
    // share rare tokens. With maxDocFrequency=0.5 the token "common"
    // (df=6/6) is cut, so pairs linked ONLY by it vanish while
    // rare-token pairs keep their exact (full-set-size) jaccard.
    val d = Seq(
      (1L, "common rare1 rare2"), (2L, "common rare1 rare2"),
      (3L, "common rare3 rare4"), (4L, "common rare3 rare4"),
      (5L, "common alone1 alone2"), (6L, "common alone3 alone4")
    ).toDF("doc_id", "text")
    val uncut = Dedup.jaccardSimJoinOn(d, col("doc_id"),
      TextAnalysis.tokens(col("text")), threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every pair shares at least "common": 15 pairs at jaccard 1/5 = 0.2 —
    // at threshold 0.3 only the twin pairs remain, but the CANDIDATES
    // include all; cut the df and the "common"-only pairs never form
    val cut = Dedup.jaccardSimJoinOn(d, col("doc_id"),
      TextAnalysis.tokens(col("text")), threshold = 0.3, maxDocFrequency = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(uncut.keySet === Set((1L, 2L), (3L, 4L)))
    assert(cut.keySet === Set((1L, 2L), (3L, 4L)))
    // the cut makes jaccard a LOWER BOUND: intersection drops "common"
    // (2 of 3 shared tokens remain) while sz_a+sz_b−inter GROWS →
    // 2/(3+3−2) = 0.5 ≤ the true 1.0
    assert(cut((1L, 2L)) === 0.5)
    assert(uncut((1L, 2L)) === 1.0)
    // lower threshold: uncut sees the common-only pairs, cut does not
    val uncutLow = Dedup.jaccardSimJoinOn(d, col("doc_id"),
      TextAnalysis.tokens(col("text")), threshold = 0.1)
      .collect().length
    val cutLow = Dedup.jaccardSimJoinOn(d, col("doc_id"),
      TextAnalysis.tokens(col("text")), threshold = 0.1, maxDocFrequency = 0.5)
      .collect().length
    assert(uncutLow === 15) // all C(6,2) pairs share "common"
    assert(cutLow === 2)    // only the rare-token twins generate candidates
  }

  test("simhash bitsPerBand widens keys; hot-bucket cap bounds candidates with logged drops") {
    import spark.implicits._
    // skewed corpus: 40 boilerplate docs whose signatures collide (the
    // shared tokens out-vote the unique suffix on every bit → identical
    // simhash → one hot bucket) plus one identical-content pair of
    // distinct text (hamming 0 — caught at ANY band width, so the
    // assertions below are deterministic)
    val boiler = (0 until 40).map(i => (i.toLong, "term apply begin " * 5 + s"x$i"))
    val pairDocs = Seq(
      (100L, "completely different content about spark query engines at scale"),
      (101L, "completely different content about spark query engines at scale"))
    val d = (boiler ++ pairDocs).toDF("doc_id", "text")
    val uncapped = Dedup.simhashNearDups(d, col("doc_id"), col("text"),
      maxHamming = 8).collect()
    // the boilerplate docs dominate: O(40²/2) candidate pairs verified
    assert(uncapped.count(r => r.getLong(0) < 100L) > 100)
    val capped = Dedup.simhashNearDups(d, col("doc_id"), col("text"),
      maxHamming = 8, maxBucketSize = Some(10L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // hot buckets (the 40 boilerplate docs co-located in every band) are
    // dropped; the genuine pair lives in a small bucket and survives
    assert(capped.contains((100L, 101L)))
    assert(!capped.exists { case (a, b) => a < 100L && b < 100L })
    // wider band keys (32 bits × 2 bands) must still catch the true pair
    // within its hamming guarantee when signatures are band-equal
    val wide = Dedup.simhashNearDups(d, col("doc_id"), col("text"),
      maxHamming = 8, bitsPerBand = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide.contains((100L, 101L)))
  }

  test("incremental dedup: cross-corpus candidates match split self-join; anti-join keeps non-dups") {
    import spark.implicits._
    val dup = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq(
      (1L, dup),
      (2L, "completely unrelated corpus document about database engines")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, dup),
      (11L, "fresh unseen content with no overlap at all in any shingle")).toDF("doc_id", "text")
    val cand = Dedup.minhashCandidatesAgainst(batch, corpus, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand === Set((10L, 1L)))
    val kept = Dedup.dedupAgainstCorpus(batch, corpus, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(11L))

    // equivalence on real data: banding a split corpus across sides ==
    // the self-join candidates of the union restricted to cross pairs
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 10
    val nb = docs.filter(bucket === 0)
    val cb = docs.filter(bucket =!= 0)
    val newIds = nb.select("doc_id").as[Long].collect().toSet
    val cross = Dedup.minhashCandidatesAgainst(nb, cb, col("doc_id"), col("text"),
        shingleHasher = Dedup.shingleHashes32Md5)
      .collect().map(r => Set(r.getLong(0), r.getLong(1))).toSet
    val self = Dedup.minhashCandidates(docs, col("doc_id"), col("text"),
        shingleHasher = Dedup.shingleHashes32Md5)
      .collect().map(r => Set(r.getLong(0), r.getLong(1)))
      .filter(p => p.count(newIds.contains) == 1).toSet
    assert(cross === self)
  }

  test("cluster-size distribution (q162 shape): hand-built components histogram") {
    import spark.implicits._
    // chain 1-2-3 (size 3), pair 10-11 (size 2), pair 20-21 (size 2)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs, iters = 8)
    val dist = comp.groupBy("component").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === Map(3L -> 1L, 2L -> 2L))
  }

  test("cross-source dup matrix (q155): attributed pairs, normalized, shares sum to 1") {
    import spark.implicits._
    // Three near-identical docs spanning sources a/a/b plus one
    // unrelated doc: banding finds all 3 pairs of the triple, so the
    // matrix must read (a,a)=1, (a,b)=2 — order-normalized — and the
    // unrelated doc contributes nothing.
    val dir = java.nio.file.Files.createTempDirectory("xsrc").toString
    val dup = "the quick brown fox jumps over the lazy dog again and again today"
    Seq(
      (1L, "a", dup), (2L, "a", dup), (3L, "b", dup),
      (4L, "c", "entirely unrelated content with no shared shingles whatsoever here")
    ).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.TextSim.q155_cross_source_dups(spark, dir).collect()
    val m = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m === Map(("a", "a") -> 1L, ("a", "b") -> 2L))
    // normalization: source_a <= source_b on every row; shares sum to 1
    rows.foreach(r => assert(r.getString(0) <= r.getString(1)))
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-6)
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("prefix-filter jaccard join ≡ plain inverted-index join (crafted)") {
    val items = TextAnalysis.tokens(col("text"))
    for (t <- Seq(0.5, 0.8, 0.9)) {
      val plain = pairsOf(Dedup.jaccardSimJoinOn(docs, col("doc_id"), items, t))
      val pf = pairsOf(Dedup.prefixFilterJaccardJoinOn(docs, col("doc_id"), items, t))
      assert(pf === plain, s"threshold $t")
    }
  }

  test("prefix-filter jaccard join ≡ plain join on real shingles (sf0.001)") {
    val real = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val items = TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3)
    val plain = pairsOf(Dedup.jaccardSimJoinOn(real, col("doc_id"), items, 0.8))
    val pf = pairsOf(Dedup.prefixFilterJaccardJoinOn(real, col("doc_id"), items, 0.8))
    assert(pf === plain)
    assert(pf.nonEmpty) // the synthetic corpus has near-dup pairs ≥ 0.8
  }

  test("prefix-filter at threshold 1.0 keeps exactly the identical-set pairs") {
    val items = TextAnalysis.tokens(col("text"))
    val pf = pairsOf(Dedup.prefixFilterJaccardJoinOn(docs, col("doc_id"), items, 1.0))
    assert(pf === Map((0L, 1L) -> 1.0))
  }

  private def contPairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap

  test("prefix-filter containment join ≡ plain containment join (crafted + real)") {
    val items = TextAnalysis.tokens(col("text"))
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val plain = contPairsOf(
        Dedup.containmentJoinOn(docs, col("doc_id"), items, t))
      val pf = contPairsOf(
        Dedup.prefixFilterContainmentJoinOn(docs, col("doc_id"), items, t))
      assert(pf === plain, s"threshold $t")
    }
    val real = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val shingles = TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3)
    val plain = contPairsOf(
      Dedup.containmentJoinOn(real, col("doc_id"), shingles, 0.8))
    val pf = contPairsOf(
      Dedup.prefixFilterContainmentJoinOn(real, col("doc_id"), shingles, 0.8))
    assert(pf === plain)
    assert(pf.nonEmpty)
  }

  test("prefix-filter containment finds the subset pair plain jaccard misses") {
    import spark.implicits._
    val d = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j"))
    ).toDF("id", "items")
    val got = Dedup.prefixFilterContainmentJoinOn(d, col("id"), col("items"), 0.9)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(got === Array((1L, 2L, 3L, 3L, 10L, 1.0, 0.3)))
    assert(Dedup.prefixFilterJaccardJoinOn(d, col("id"), col("items"), 0.9).isEmpty)
  }

  private def woPairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3))).toMap

  test("prefix-filter weighted overlap ≡ plain weighted overlap (crafted + real)") {
    val items = TextAnalysis.tokens(col("text"))
    // span the regimes: tiny minWeight (prefix ≈ everything), the
    // realistic band, and one above every crafted pair's weight
    for (mw <- Seq(1L, 500000L, 2000000L, 50000000L)) {
      val plain = woPairsOf(
        Dedup.weightedOverlapJoinOn(docs, col("doc_id"), items, mw))
      val pf = woPairsOf(
        Dedup.prefixFilterWeightedOverlapJoinOn(docs, col("doc_id"), items, mw))
      assert(pf === plain, s"minWeight $mw")
    }
    val real = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val shingles = TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3)
    val plain = woPairsOf(
      Dedup.weightedOverlapJoinOn(real, col("doc_id"), shingles, 3000000L))
    val pf = woPairsOf(
      Dedup.prefixFilterWeightedOverlapJoinOn(real, col("doc_id"), shingles, 3000000L))
    assert(pf === plain)
    assert(pf.nonEmpty) // the synthetic corpus has rare-shingle overlaps
  }

  private def censusOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.get(2), r.getLong(3))).toMap

  test("prefix census ≡ demo census (q238/q239 pin); uncut default routes to prefix") {
    // The census reduction is SHARED code (overlapCensusReduce /
    // containmentCensusReduce), so this pin is really about the pair
    // sources agreeing — and about the library DEFAULT: an uncut
    // census call must produce the demo's rows through the
    // prefix-filtered candidate scheme without opting in.
    val items = TextAnalysis.tokens(col("text"))
    for (mw <- Seq(500000L, 2000000L)) {
      val demo = censusOf(Dedup.weightedOverlapCensus(
        docs, col("doc_id"), items, mw, plainPairs = true))
      val pf = censusOf(Dedup.prefixFilterWeightedOverlapCensus(
        docs, col("doc_id"), items, mw))
      val dflt = censusOf(Dedup.weightedOverlapCensus(
        docs, col("doc_id"), items, mw))
      assert(pf === demo, s"wo minWeight $mw")
      assert(dflt === demo, s"wo default minWeight $mw")
    }
    for (t <- Seq(0.5, 0.8)) {
      val demo = censusOf(Dedup.containmentCensus(
        docs, col("doc_id"), items, t, plainPairs = true))
      val pf = censusOf(Dedup.prefixFilterContainmentCensus(
        docs, col("doc_id"), items, t))
      val dflt = censusOf(Dedup.containmentCensus(docs, col("doc_id"), items, t))
      assert(pf === demo, s"ct threshold $t")
      assert(dflt === demo, s"ct default threshold $t")
    }
    // real shingles at the shipped operating points (q222/q238 = uncut
    // weighted overlap; containment uncut — q239's point, NOT q231's
    // df-cut, which the default deliberately leaves on the plain path)
    val real = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val shingles = TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3)
    val woDemo = censusOf(Dedup.weightedOverlapCensus(
      real, col("doc_id"), shingles, 3000000L, plainPairs = true))
    assert(woDemo.nonEmpty)
    assert(censusOf(Dedup.prefixFilterWeightedOverlapCensus(
      real, col("doc_id"), shingles, 3000000L)) === woDemo)
    val ctDemo = censusOf(Dedup.containmentCensus(
      real, col("doc_id"), shingles, 0.8, plainPairs = true))
    assert(ctDemo.nonEmpty)
    assert(censusOf(Dedup.prefixFilterContainmentCensus(
      real, col("doc_id"), shingles, 0.8)) === ctDemo)
  }

  test("jaccard census ≡ demo census (q240 pin); uncut default routes to prefix") {
    // Same contract as the q238/q239 pin, for the family that lacked a
    // census: jaccardCensusReduce is shared code, so the pin is about
    // the pair sources agreeing and the uncut default taking the
    // prefix-filtered scheme.
    val items = TextAnalysis.tokens(col("text"))
    for (t <- Seq(0.5, 0.8)) {
      val demo = censusOf(Dedup.jaccardCensus(
        docs, col("doc_id"), items, t, plainPairs = true))
      val pf = censusOf(Dedup.prefixFilterJaccardCensus(
        docs, col("doc_id"), items, t))
      val dflt = censusOf(Dedup.jaccardCensus(docs, col("doc_id"), items, t))
      assert(pf === demo, s"jc threshold $t")
      assert(dflt === demo, s"jc default threshold $t")
    }
    val real = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val shingles = TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3)
    val jcDemo = censusOf(Dedup.jaccardCensus(
      real, col("doc_id"), shingles, 0.8, plainPairs = true))
    assert(jcDemo.nonEmpty)
    assert(censusOf(Dedup.prefixFilterJaccardCensus(
      real, col("doc_id"), shingles, 0.8)) === jcDemo)
  }

  test("weighted prefix prunes the hot item but still finds the rare-overlap pair") {
    import spark.implicits._
    // "hot" appears in all 4 docs (w = 250000); "rare1"/"rare2" appear
    // in 2 docs each (w = 500000). At minWeight 900000 a qualifying
    // pair needs both rares (1000000) — the hot item alone (250000)
    // can never finish a pair, and each doc's tail sum at the hot
    // item's rank is 250000 < 900000, so hot is OUTSIDE every prefix:
    // the candidate join never touches the corpus-wide posting list.
    val d = Seq(
      (1L, Seq("hot", "rare1", "rare2")),
      (2L, Seq("hot", "rare1", "rare2")),
      (3L, Seq("hot", "only3")),
      (4L, Seq("hot", "only4"))
    ).toDF("id", "items")
    val got = Dedup.prefixFilterWeightedOverlapJoinOn(d, col("id"), col("items"), 900000L)
      .as[(Long, Long, Long, Long)].collect()
    // inter counts ALL shared items (incl. hot): 3 shared, weight
    // 500000 + 500000 + 250000 = 1250000
    assert(got === Array((1L, 2L, 3L, 1250000L)))
  }

  test("lsh band planner: divisor grid, monotone fp/fn, chosen = min cost") {
    val real = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val items = TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3)
    val rows = Dedup.lshBandPlan(real, col("doc_id"), items, threshold = 0.5)
      .orderBy("bands").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 64L), (2L, 32L), (4L, 16L), (8L, 8L), (16L, 4L), (32L, 2L), (64L, 1L)))
    // more bands → more collisions: fp non-decreasing, fn non-increasing
    val fp = rows.map(_.getLong(2)); val fn = rows.map(_.getLong(3))
    fp.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    fn.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    val minCost = rows.map(_.getLong(4)).min
    rows.foreach(r => assert(r.getBoolean(5) === (r.getLong(4) === minCost)))
    assert(rows.count(_.getBoolean(5)) >= 1)
  }

  test("lsh plan drift: a near-dup-flooded batch flips the operating point; a uniform batch doesn't") {
    val real = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val items = TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3)
    // shifted-similarity batch: every doc arrives with two
    // near-identical variants (the re-crawl near-dup flood) — the
    // sample's high-similarity mass makes misses dominate, so the
    // cost-minimal split moves to MORE bands than the corpus's choice.
    // 16 bases × 3 = 48 rows = the sample size, so the md5 sample IS
    // the whole batch and every triple's pairs are priced —
    // deterministic, not dilution-dependent
    val seed0 = real.filter(col("doc_id") < 16)
      .select(col("doc_id"), col("text"))
    val flooded = seed0
      .unionByName(seed0.select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" driftvariantx")).as("text")))
      .unionByName(seed0.select((col("doc_id") + 200000L).as("doc_id"),
        concat(col("text"), lit(" driftvarianty")).as("text")))
    val d = Dedup.lshPlanDrift(real, flooded, col("doc_id"), items,
      threshold = 0.5).orderBy("bands").collect()
    assert(d.length === 7)
    val corpusChosen = d.filter(_.getAs[Boolean]("corpus_chosen"))
      .map(_.getAs[Long]("bands")).toSet
    val batchChosen = d.filter(_.getAs[Boolean]("batch_chosen"))
      .map(_.getAs[Long]("bands")).toSet
    assert(d.forall(_.getAs[Boolean]("plan_changed")),
      "the flooded batch must flip the plan")
    assert(corpusChosen.intersect(batchChosen).isEmpty,
      "plan_changed requires no corpus-chosen split to stay batch-chosen")
    assert(batchChosen.max > corpusChosen.max,
      "a high-similarity flood must move the choice to MORE bands")
    // the census justifies the flip in the same frame: the batch
    // sample carries above-threshold mass the corpus sample lacks
    val r0 = d.head
    assert(r0.getAs[Long]("batch_pairs_ge_t") >
      r0.getAs[Long]("corpus_pairs_ge_t"))

    // uniform batch (a plain slice of the corpus): the shipped point
    // stays optimal — no flip, nothing to alert on
    val calm = Dedup.lshPlanDrift(real,
      real.filter(col("doc_id") % 2 === 0), col("doc_id"), items,
      threshold = 0.5).collect()
    assert(calm.forall(!_.getAs[Boolean]("plan_changed")),
      "a same-distribution batch must not flip the plan")
  }

  test("sampled recall audit: full-coverage sample ≡ the exact q149 audit") {
    val real = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    // sample size past the corpus size -> every doc anchors -> the
    // anchored truth/candidate sets ARE the full audit's
    val sampled = Dedup.lshRecallAuditSampled(real, col("doc_id"),
      col("text"), threshold = 0.5, sampleSize = 1000000,
      shingleHasher = Dedup.shingleHashes32Md5)
      .collect().head
    val truth = Dedup.jaccardSimJoinOn(real, col("doc_id"),
      TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3),
      threshold = 0.5).select("id_a", "id_b")
    val cand = Dedup.minhashCandidates(real, col("doc_id"), col("text"),
      shingleHasher = Dedup.shingleHashes32Md5).select("id_a", "id_b")
    val nTrue = truth.count(); val nCand = cand.count()
    val nCaught = truth.join(cand, Seq("id_a", "id_b")).count()
    assert(sampled.getLong(1) === nTrue && sampled.getLong(2) === nCand &&
      sampled.getLong(3) === nCaught,
      s"full-coverage sample must reproduce the exact audit: $sampled " +
        s"vs ($nTrue, $nCand, $nCaught)")

    // a partial sample is an unbiased pair sample: counts bounded by
    // the full audit's, estimates deterministic (same seed -> same row)
    val s1 = Dedup.lshRecallAuditSampled(real, col("doc_id"), col("text"),
      threshold = 0.5, sampleSize = 128,
      shingleHasher = Dedup.shingleHashes32Md5).collect().head
    val s2 = Dedup.lshRecallAuditSampled(real, col("doc_id"), col("text"),
      threshold = 0.5, sampleSize = 128,
      shingleHasher = Dedup.shingleHashes32Md5).collect().head
    assert(s1 === s2, "md5-ordered sampling must be deterministic")
    assert(s1.getLong(0) === 128L)
    assert(s1.getLong(1) <= nTrue && s1.getLong(2) <= nCand)
    // estimates within a coarse band of the full audit where defined
    // (the anchored subset is small at sf0.001 — this pins sanity, the
    // full-coverage equality above pins exactness)
    if (!s1.isNullAt(4) && nTrue > 0) {
      val fullRecall = nCaught.toDouble / nTrue
      assert(math.abs(s1.getDouble(4) - fullRecall) <= 0.5,
        s"sampled recall ${s1.getDouble(4)} vs full $fullRecall")
    }
  }

  test("prefix index is a strict subset of the full inverted index") {
    val real = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val items = TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3)
    val toks = real.select(col("doc_id").as("id"), array_distinct(items).as("toks"))
      .withColumn("sz", size(col("toks")).cast("long"))
      .filter(col("sz") > 0)
    val full = toks.select(explode(col("toks"))).count()
    val prefix = Dedup.rarestFirstPrefix(toks, 800000L).count()
    // t=0.8 keeps sz - floor(0.8·sz) + 1 ≈ 20% of postings per doc
    assert(prefix < full * 3 / 10, s"prefix $prefix vs full $full")
    assert(prefix > 0)
  }
}

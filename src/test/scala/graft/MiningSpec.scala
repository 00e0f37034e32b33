package graft

import org.apache.spark.sql.functions._

/** Mining operators (q117–q121): triangle census, blocked Levenshtein
  * fuzzy dedup, asymmetric containment, Markov transitions, and the
  * √-temperature mixture — each pinned on hand-computable fixtures.
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  test("nodeTriangles: one triangle plus a pendant edge") {
    // triangle {1,2,3} + pendant 4—1; edges passed symmetric
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = graft.graph.Triangles.nodeTriangles(edges)
      .orderBy("node").as[(Long, Long, Long)].collect()
    assert(got === Array((1L, 3L, 1L), (2L, 2L, 1L), (3L, 2L, 1L), (4L, 1L, 0L)))
  }

  test("nodeTriangles: square (4-cycle) has zero triangles") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = graft.graph.Triangles.nodeTriangles(edges)
    assert(got.agg(sum("n_tri")).as[Long].head() === 0L)
    assert(got.count() === 4)
  }

  test("editDistancePairs: typo variant found, cross-block pair skipped") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brwon fox jumps over the lazy dog"), // transposition
      (3L, "the quick brown fox jumps over the lazy cat and more words here"),
      (4L, "a completely different first token sentence")
    ).toDF("doc_id", "text")
    val pairs = graft.dedup.FuzzyDedup
      .editDistancePairs(docs, col("doc_id"), col("text"),
        maxDist = 5, prefixLen = 40, lenBucket = 64)
      .orderBy("id_a", "id_b").as[(Long, Long, Long)].collect()
    // 1↔2 distance 2 (transposed chars); 1↔3 same prefix class but
    // text lengths 44 vs 64 → same bucket 0 and dist 0 within prefix 40
    assert(pairs.contains((1L, 2L, 2L)))
    // doc 4 blocks on a different first token: never compared
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containmentJoinOn: subset has containment 1.0 despite low jaccard") {
    val docs = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j"))
    ).toDF("id", "items")
    val got = graft.dedup.Dedup
      .containmentJoinOn(docs, col("id"), col("items"), threshold = 0.9)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(got === Array((1L, 2L, 3L, 3L, 10L, 1.0, 0.3)))
    // symmetric jaccard (3/10) would have missed this pair at the same bar
    val j = graft.dedup.Dedup
      .jaccardSimJoinOn(docs, col("id"), col("items"), threshold = 0.9)
    assert(j.isEmpty)
  }

  test("containmentCensus agrees with the pair list it summarizes") {
    import graft.text.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val grams = TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3)
    // the q119 operating point, so the census summarizes the shipped demo
    val pairs = graft.dedup.Dedup
      .containmentJoinOn(docs, col("doc_id"), grams,
        threshold = 0.6, maxDocFrequency = 0.006).collect()
    assert(pairs.nonEmpty) // the corpus must actually exercise the shape
    val census = graft.dedup.Dedup
      .containmentCensus(docs, col("doc_id"), grams,
        threshold = 0.6, maxDocFrequency = 0.006)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // per-direction replay: each doc carries the containment with ITS
    // size in the denominator (cont_a_in_b rides with id_a)
    val perDoc = pairs.flatMap { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (cab, cba) = (r.getDouble(5), r.getDouble(6))
      Seq(a -> (b, cab), b -> (a, cba))
    }.groupBy(_._1)
    assert(census.keySet === perDoc.keySet)
    perDoc.foreach { case (id, ps) =>
      val (n, cMax, top) = census(id)
      assert(n === ps.length)
      assert(cMax === ps.map(_._2._2).max)
      assert(top === ps.map(_._2).filter(_._2 == cMax).map(_._1).min)
    }
  }

  test("weightedOverlapJoinOn: one rare shared item outweighs common ones") {
    // item x in 3 docs (w=333333), item r in 2 docs (w=500000)
    val docs = Seq(
      (1L, Seq("x", "r")), (2L, Seq("x", "r")), (3L, Seq("x"))
    ).toDF("id", "items")
    val got = graft.dedup.Dedup
      .weightedOverlapJoinOn(docs, col("id"), col("items"),
        minWeight = 400000L)
      .orderBy("id_a", "id_b").as[(Long, Long, Long, Long)].collect()
    // only (1,2) passes: 333333 + 500000; the x-only pairs stay at 333333
    assert(got === Array((1L, 2L, 2L, 833333L)))
  }

  test("charClassEntropy: pure, 2-class, and uniform 5-class groups") {
    val docs = Seq(
      ("a", "aaaa"),       // one class → H = 0
      ("b", "aAbB"),       // two equal classes → H = 1 bit
      ("c", "aA1 ?")       // all five classes once → H = log2(5)
    ).toDF("source", "text")
    val got = graft.text.TextAnalysis
      .charClassEntropy(docs, col("source"), col("text"))
      .orderBy("grp").as[(String, Long, Double)].collect()
    assert(got === Array(
      ("a", 4L, 0.0), ("b", 4L, 1.0), ("c", 5L, 2.321928)))
  }

  test("winnowFromHashes: shared run >= w+n-1 tokens shares a fingerprint") {
    import graft.text.TextAnalysis
    // both docs contain the same 6-token run (w=4, n=3 → guarantee 6)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique1 tail1 x y"),
      (2L, "front2 other2 alpha beta gamma delta epsilon zeta w z")
    ).toDF("doc_id", "text")
      .withColumn("hs", TextAnalysis.shingleHashes(col("text"), 3))
    val fps = docs.select(col("doc_id"),
      explode(TextAnalysis.winnowFromHashes(col("hs"), 4)).as("fp"))
    val shared = fps.filter(col("doc_id") === 1)
      .join(fps.filter(col("doc_id") === 2), "fp")
    assert(shared.count() >= 1, "winnowing guarantee violated")
    // selection is sparse: never more fingerprints than windows
    val counts = docs.select(
      size(TextAnalysis.winnowFromHashes(col("hs"), 4)).as("n_fp"),
      (size(col("hs")) - 3).as("n_win"))
    assert(counts.filter(col("n_fp") > col("n_win")).isEmpty)
    // empty text selects nothing
    val empty = Seq((3L, "")).toDF("doc_id", "text")
      .withColumn("hs", TextAnalysis.shingleHashes(col("text"), 3))
      .select(size(TextAnalysis.winnowFromHashes(col("hs"), 4)))
      .as[Int].head()
    assert(empty === 0)
  }

  test("keepBestByScore: cluster keeps its max-score member, singletons survive") {
    val docs = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.9), // one cluster; 2 and 3 tie on score
      (4L, 0.1)                        // unclustered singleton
    ).toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = graft.dedup.Dedup
      .keepBestByScore(docs, col("id"), pairs, col("score"))
      .orderBy("component")
      .select("component", "id", "score", "cluster_size")
      .as[(Long, Long, Double, Long)].collect()
    // tie at 0.9 → lower id (2) wins; singleton 4 is its own component
    assert(got === Array((1L, 2L, 0.9, 3L), (4L, 4L, 0.1, 1L)))
  }

  test("Markov.transitions: probabilities row-normalize per prev state") {
    val events = Seq(
      (10L, 1L, "view"), (10L, 2L, "view"), (10L, 3L, "buy"),
      (20L, 4L, "view"), (20L, 5L, "buy"), (20L, 6L, "view")
    ).toDF("user_id", "event_id", "event_type")
      .withColumn("ts", col("event_id").cast("timestamp"))
    val got = graft.analytics.Markov
      .transitions(events, col("user_id"), col("event_type"),
        Seq(col("ts"), col("event_id")))
      .orderBy("prev_state", "next_state")
      .as[(String, String, Long, Double)].collect()
    // transitions: view→view (u10), view→buy (u10, u20), buy→view (u20)
    assert(got === Array(
      ("buy", "view", 1L, 1.0),
      ("view", "buy", 2L, 0.666667),
      ("view", "view", 1L, 0.333333)))
  }

  test("centroidCosineMatrix: parallel labels cos 1, orthogonal labels cos 0") {
    val vecs = Seq(
      (1, Array(1f, 0f)), (1, Array(3f, 0f)), // centroid along e0
      (2, Array(2f, 0f)),                     // parallel to label 1
      (3, Array(0f, 5f)),                     // orthogonal to both
      (4, Array(0f, 0f))                      // zero-norm: undefined cosine
    ).toDF("label", "embedding")
    val got = graft.similarity.Similarity
      .centroidCosineMatrix(vecs, col("label"), col("embedding"))
      .orderBy("label_a", "label_b")
      .as[(Int, Int, Double)].collect()
    // label 4's pairs are dropped (no NaN rows), the rest are exact
    assert(got === Array((1, 2, 1.0), (1, 3, 0.0), (2, 3, 0.0)))
  }

  test("fkAudit: orphans counted, null FKs tracked separately") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val got = graft.operators.Quality
      .fkAudit(child, "child", col("fk"), parent, "parent", col("pk"))
      .as[(String, Long, Long, Long, Long)].head()
    // 4 rows, 1 null FK, 2 distinct non-null keys, 1 orphan (the 9);
    // the label carries the FK column so twin edges stay distinct
    assert(got === (("child.fk->parent", 4L, 1L, 2L, 1L)))
  }

  test("uniqueAudit: surplus counts rows beyond one per key") {
    val t = Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "w")).toDF("k", "v")
    val got = graft.operators.Quality
      .uniqueAudit(t, "t:k", Seq(col("k")))
      .as[(String, Long, Long, Long, Long)].head()
    // 4 rows over 2 keys → 2 surplus; hottest key has 3 rows
    assert(got === (("t:k", 4L, 2L, 2L, 3L)))
    // the synthetic lineitem really does duplicate its composite key —
    // the audit exists to find exactly this
    val li = graft.operators.Quality.uniqueAudit(
      Tables.load(spark, TestSpark.sf0001, "lineitem"),
      "lineitem", Seq(col("l_orderkey"), col("l_linenumber")))
      .as[(String, Long, Long, Long, Long)].head()
    assert(li._4 > 0L, "expected surplus rows on lineitem's composite key")
  }

  test("psiPairs: identical distributions score 0, disjoint ones score high") {
    // a ≡ b (same values) → every bin has p = q → PSI exactly 0;
    // a vs c live at opposite ends of the range → large PSI
    val rows =
      (1 to 50).map(i => ("a", (i % 10).toLong)) ++
        (1 to 50).map(i => ("b", (i % 10).toLong)) ++
        (1 to 50).map(i => ("c", 90L + (i % 10)))
    val got = graft.analytics.Drift
      .psiPairs(rows.toDF("grp", "v"), col("grp"), col("v"))
      .orderBy("grp_a", "grp_b")
      .select("grp_a", "grp_b", "psi").as[(String, String, Double)].collect()
    val psi = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(psi(("a", "b")) === 0.0)
    assert(psi(("a", "c")) > 1.0, s"disjoint pair scored ${psi(("a", "c"))}")
    assert(psi(("a", "c")) === psi(("b", "c")), "b ≡ a must drift identically vs c")
  }

  test("rollingCountAnomalies: spike flagged, baseline excludes it, flat key silent") {
    // key "a": 24 alternating 4/6 buckets (mean 5), then a 15-spike;
    // key "flat": constant counts → zero variance → never flagged
    val rows =
      (1 to 24).flatMap(b => Seq.fill(if (b % 2 == 0) 6 else 4)(("a", b))) ++
        Seq.fill(15)(("a", 25)) ++
        (1 to 25).flatMap(b => Seq.fill(5)(("flat", b)))
    val got = graft.analytics.Drift
      .rollingCountAnomalies(rows.toDF("k", "b"), col("k"), col("b"), 24)
      .as[(String, Int, Long, Double)].collect()
    // only the spike bucket has a full 24-window AND nonzero variance
    val expZ = BigDecimal((15.0 - 5.0) / math.sqrt(24.0 / 23.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Array(("a", 25, 15L, expZ)))
  }

  test("burstiness: bursty key ≫ 1, constant key 0, single-bucket dropped") {
    // "a": bucket counts 1,1,1,9 → mean 3, sample var 16 → Fano 16/3;
    // "flat": constant 5s → var 0 → Fano 0; "solo": 1 bucket → dropped
    val rows =
      Seq(("a", 1), ("a", 2), ("a", 3)) ++ Seq.fill(9)(("a", 4)) ++
        (1 to 4).flatMap(b => Seq.fill(5)(("flat", b))) ++
        Seq.fill(7)(("solo", 1))
    val got = graft.analytics.Drift
      .burstiness(rows.toDF("k", "b"), col("k"), col("b"))
      .orderBy("k")
      .as[(String, Long, Long, Double)].collect()
    val expFano = BigDecimal(16.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Array(("a", 4L, 12L, expFano), ("flat", 4L, 20L, 0.0)))
  }

  test("concentration: linear ramp Gini 0.25 / HHI 0.30, uniform Gini 0") {
    // counts 1,2,3,4 → shares .1/.2/.3/.4: HHI = 30/100 = 0.30,
    // Gini = (2·Σrc − (n+1)·Σc)/(n·Σc) = (60 − 50)/40 = 0.25
    val ramp = (Seq("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(4)("d")).map(Tuple1(_)).toDF("s")
    val got = graft.analytics.Drift.concentration(ramp, col("s"))
      .as[(Long, Long, Double, Double)].collect()
    assert(got === Array((4L, 10L, 0.3, 0.25)))
    // uniform 4×5 → HHI = 1/n = 0.25, Gini = 0
    val flat = (1 to 4).flatMap(i => Seq.fill(5)(s"k$i"))
      .map(Tuple1(_)).toDF("s")
    val gotFlat = graft.analytics.Drift.concentration(flat, col("s"))
      .as[(Long, Long, Double, Double)].collect()
    assert(gotFlat === Array((4L, 20L, 0.25, 0.0)))
  }

  test("unigramEntropy: uniform hits log2(n), constant hits 0, mixed exact") {
    // "uni": 4 distinct singletons → H = log2(4) = 2 bits (max);
    // "rep": one token ×4 → H = 0; "mix": {x:2, y:2} → H = 1 bit
    val docs = Seq(
      ("uni", "p q r s"), ("rep", "z z z z"), ("mix", "x x y y"))
      .toDF("src", "text")
    val got = graft.text.Corpus
      .unigramEntropy(docs, col("src"), col("text"))
      .orderBy("g")
      .as[(String, Long, Long, Double)].collect()
    assert(got === Array(
      ("mix", 2L, 4L, 1.0), ("rep", 1L, 4L, 0.0), ("uni", 4L, 4L, 2.0)))
  }

  test("contaminationCensus: shared trigram counted once, clean/short docs absent") {
    // eval set holds one doc with grams {a b c, b c d}; corpus doc 1
    // contains "a b c" twice (distinct-gram census counts it ONCE);
    // doc 2 is clean; doc 3 is shorter than a trigram and can never be
    // flagged; doc 4 matches both eval grams case-insensitively
    val evalSet = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x a b c y a b c"), // grams: {x a b, a b c, b c y, c y a, y a b}
      (2L, "p q r s t"),
      (3L, "a b"),
      (4L, "A b C d e")). // grams: {a b c, b c d, c d e} -> 2 hits
      toDF("doc_id", "text")
    val got = graft.text.Decontam
      .contaminationCensus(corpus, evalSet, 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(got === Array((1L, 5L, 1L, 0.2), (4L, 3L, 2L, 0.666667)))
  }

  test("unigramJsd: identical 0, disjoint 1, half-shared 0.5 exactly") {
    // g1/g2 identical -> 0; g1/g3 share token 'a' at equal mass 1/2
    // (shared term 0, one-sided mass 1/2 each side -> 0.5); g2/g3 same;
    // g1/g4 disjoint -> the left-joined maximum of 1
    val docs = Seq(
      ("g1", "a b"), ("g2", "a b"), ("g3", "a c"), ("g4", "z w"))
      .toDF("src", "text")
    val got = graft.text.Corpus
      .unigramJsd(docs, col("src"), col("text"))
      .orderBy("g_a", "g_b")
      .as[(String, String, Long, Double)].collect()
    assert(got === Array(
      ("g1", "g2", 2L, 0.0), ("g1", "g3", 1L, 0.5), ("g1", "g4", 0L, 1.0),
      ("g2", "g3", 1L, 0.5), ("g2", "g4", 0L, 1.0), ("g3", "g4", 0L, 1.0)))
  }

  test("Eval.kappa: chance-level 0, perfect 1, nulls excluded, constant null") {
    // all four cells once: po = 0.5 = pe -> kappa 0; the null-rater
    // row lands in n_excluded only
    val mixed = Seq(
      (Some(true), Some(true)), (Some(true), Some(false)),
      (Some(false), Some(true)), (Some(false), Some(false)),
      (None: Option[Boolean], Some(true))).toDF("a", "b")
    val m = graft.ml.Eval.kappa(mixed, col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Long, Double, Double, Option[Double])]
      .head()
    assert(m === ((4L, 1L, 1L, 1L, 1L, 1L, 0.5, 0.5, Some(0.0))))
    // perfect agreement with both classes present -> kappa 1
    val perfect = Seq((true, true), (false, false)).toDF("a", "b")
    assert(graft.ml.Eval.kappa(perfect, col("a"), col("b"))
      .select("kappa").as[Option[Double]].head() === Some(1.0))
    // both raters constant -> pe = 1, kappa undefined -> null
    val const = Seq((true, true), (true, true)).toDF("a", "b")
    assert(graft.ml.Eval.kappa(const, col("a"), col("b"))
      .select("kappa").as[Option[Double]].head() === None)
  }

  test("Eval.aucRoc: separation 1, reversal 0, ties averaged, one-class null") {
    // perfect separation
    val sep = Seq((0.9, true), (0.8, true), (0.7, false), (0.6, false))
      .toDF("s", "y")
    assert(graft.ml.Eval.aucRoc(sep, col("s"), col("y"))
      .select("auc").as[Option[Double]].head() === Some(1.0))
    // perfectly reversed
    val rev = Seq((0.1, true), (0.9, false)).toDF("s", "y")
    assert(graft.ml.Eval.aucRoc(rev, col("s"), col("y"))
      .select("auc").as[Option[Double]].head() === Some(0.0))
    // tie-averaging: pos {0.7, 0.5}, neg {0.5, 0.3} -> 3 wins + 1 tie
    // out of 4 pairs = 0.875
    val ties = Seq((0.7, true), (0.5, true), (0.5, false), (0.3, false))
      .toDF("s", "y")
    val t = graft.ml.Eval.aucRoc(ties, col("s"), col("y"))
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(t === ((4L, 2L, 2L, 3L, Some(0.875))))
    // a single class has no ranking task -> null
    val one = Seq((0.9, true), (0.1, true)).toDF("s", "y")
    assert(graft.ml.Eval.aucRoc(one, col("s"), col("y"))
      .select("auc").as[Option[Double]].head() === None)
  }

  test("Eval.calibration: per-bin means and gaps exact, p=1 clamped to top bin") {
    val df = Seq((0.05, false), (0.15, false), (0.15, true), (1.0, true))
      .toDF("p", "y")
    val got = graft.ml.Eval.calibration(df, col("p"), col("y"))
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got === Array(
      (0L, 1L, 0L, 0.05, 0.0, 0.05),
      (1L, 2L, 1L, 0.15, 0.5, 0.35),
      (9L, 1L, 1L, 1.0, 1.0, 0.0)))
  }

  test("Eval.brierLogLoss: coin-flip 0.25/1 bit, perfect ~0, confident-wrong clamped") {
    // p = 0.5 on both classes: brier (0.5)^2 = 0.25, log-loss exactly 1 bit
    val coin = Seq((0.5, true), (0.5, false)).toDF("p", "y")
    val c = graft.ml.Eval.brierLogLoss(coin, col("p"), col("y"))
      .as[(Long, Long, Double, Double)].head()
    assert(c === ((2L, 1L, 0.25, 1.0)))
    // perfect confident prediction: zero brier; log-loss hits the
    // 1e-6 clamp floor (-log2(0.999999) rounds to 1 micro-bit)
    val perfect = Seq((1.0, true)).toDF("p", "y")
    val p = graft.ml.Eval.brierLogLoss(perfect, col("p"), col("y"))
      .as[(Long, Long, Double, Double)].head()
    assert(p === ((1L, 1L, 0.0, 0.000001)))
    // confident and wrong: brier 1.0, log-loss clamped at
    // -log2(1e-6) = 19.931569 bits instead of infinity
    val wrong = Seq((0.0, true)).toDF("p", "y")
    val w = graft.ml.Eval.brierLogLoss(wrong, col("p"), col("y"))
      .as[(Long, Long, Double, Double)].head()
    assert(w === ((1L, 1L, 1.0, 19.931569)))
  }

  test("Eval.spearman: monotone 1, inverse -1, tie-averaged, constant null") {
    val up = Seq((1.0, 10.0), (2.0, 200.0), (3.0, 250.0)).toDF("x", "y")
    assert(graft.ml.Eval.spearman(up, col("x"), col("y"))
      .select("spearman_rho").as[Option[Double]].head() === Some(1.0))
    val down = Seq((1.0, 9.0), (2.0, 5.0), (3.0, 1.0)).toDF("x", "y")
    assert(graft.ml.Eval.spearman(down, col("x"), col("y"))
      .select("spearman_rho").as[Option[Double]].head() === Some(-1.0))
    // tie in x: ranks x (1, 2.5, 2.5, 4), y (1,2,3,4) ->
    // rho = 4.5 / sqrt(4.5 * 5) = 0.948683
    val ties = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 25.0), (3.0, 30.0))
      .toDF("x", "y")
    assert(graft.ml.Eval.spearman(ties, col("x"), col("y"))
      .select("spearman_rho").as[Option[Double]].head() === Some(0.948683))
    // constant column: zero rank variance -> undefined -> null
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("x", "y")
    assert(graft.ml.Eval.spearman(const, col("x"), col("y"))
      .select("spearman_rho").as[Option[Double]].head() === None)
  }

  test("coverageCurve: exact shares, budget past vocab saturates, ties unambiguous") {
    val docs = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val got = graft.text.Corpus
      .coverageCurve(docs, col("text"), ks = Seq(1, 2, 4))
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got === Array(
      (1L, 1L, 4L, 7L, 0.571429),
      (2L, 2L, 6L, 7L, 0.857143),
      (4L, 3L, 7L, 7L, 1.0)))
    // equal-count types: k=1 takes ONE of {a, b} — coverage is the
    // same either way, so the curve needs no tie order
    val tied = Seq((1L, "a a b b c")).toDF("doc_id", "text")
    val t1 = graft.text.Corpus.coverageCurve(tied, col("text"), ks = Seq(1))
      .as[(Long, Long, Long, Long, Double)].head()
    assert(t1 === ((1L, 1L, 2L, 5L, 0.4)))
  }

  test("zipfSlope: perfect 1/rank law fits -1, flat counts fit 0") {
    // "zipf": counts 12,6,4,3 over ranks 1..4 -> c*rank = 12 constant,
    // so ln c = ln 12 - ln rank exactly: slope -1. "flat": two types
    // with equal counts -> horizontal line: slope 0. "solo": a single
    // type has no defined fit and must be dropped.
    val docs = Seq(
      ("zipf", (("a " * 12) + ("b " * 6) + ("c " * 4) + ("d " * 3)).trim),
      ("flat", "x x y y"),
      ("solo", "z z z")).toDF("src", "text")
    val got = graft.text.Corpus
      .zipfSlope(docs, col("src"), col("text"))
      .orderBy("g")
      .as[(String, Long, Double)].collect()
    assert(got.map(_._1) === Array("flat", "zipf"))
    assert(got(0)._2 === 2L && math.abs(got(0)._3) < 1e-5)
    assert(got(1)._2 === 4L && math.abs(got(1)._3 + 1.0) < 1e-5)
  }

  test("pmiCollocations: glued pair scores high, independent pair scores ~0") {
    // "new york" always co-occurs; "of the" co-occurs at chance level
    val docs = (1 to 8).map(i => (i.toLong,
      if (i % 2 == 0) "new york of x the y of z the w"
      else "new york the a of b the c of d")).toDF("doc_id", "text")
    val got = graft.text.Corpus
      .pmiCollocations(docs, col("text"), minCount = 4L)
      .where(col("w1") === "new" && col("w2") === "york")
      .select("c12", "c1", "c2", "pmi")
      .as[(Long, Long, Long, Double)].collect()
    // c12=8, c1=c2=8, T=80 → PMI = log2(8·80/64) = log2(10)
    val expPmi = BigDecimal(math.log(10.0) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Array((8L, 8L, 8L, expPmi)))
    // an unattached frequent pair never reaches "always together" PMI
    val ofThe = graft.text.Corpus
      .pmiCollocations(docs, col("text"), minCount = 1L)
      .where(col("w1") === "of" && col("w2") === "the")
      .select("pmi").as[Double].collect()
    assert(ofThe.forall(_ < expPmi - 1.0))
  }

  test("sqrtTemperatureMixture: √-flattening up-weights the rare domain") {
    val docs = (1 to 100).map(i => (i.toLong, "rare")) ++
      (1 to 400).map(i => (i.toLong, "common"))
    val rows = graft.operators.Sampling
      .sqrtTemperatureMixture(docs.toDF("id", "source"), col("source"),
        budget = 900L)
      .orderBy("domain")
      .as[(String, Long, Long, Double, Long)].collect()
    // weights √100=10, √400=20 (micro: 1e7, 2e7) → shares 1/3, 2/3
    assert(rows === Array(
      ("common", 400L, 20000000L, 0.666667, 600L),
      ("rare", 100L, 10000000L, 0.333333, 300L)))
    // raw-proportional would have given rare only 900·(100/500)=180 docs
    assert(rows.find(_._1 == "rare").get._5 > 180L)
  }

  test("distinct-n diversity (q157): hand-computed ratios; collapsed source craters") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("divn").toString
    Seq(
      // collapsed: the same 3-token phrase in every doc
      (1L, "gen", "buy cheap now"), (2L, "gen", "buy cheap now"),
      (3L, "gen", "buy cheap now"),
      // natural: all-distinct tokens
      (4L, "nat", "one two three"), (5L, "nat", "four five six")
    ).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.CorpusQueries.q157_distinct_ngrams(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // gen: 9 unigram occurrences of 3 types; 6 bigrams of 2 types; 3
    // trigrams of 1 type. nat: everything unique.
    assert(rows(("gen", 1L)) === ((9L, 3L, 0.333333)))
    assert(rows(("gen", 2L)) === ((6L, 2L, 0.333333)))
    assert(rows(("gen", 3L)) === ((3L, 1L, 0.333333)))
    assert(rows(("nat", 1L)) === ((6L, 6L, 1.0)))
    assert(rows(("nat", 2L)) === ((4L, 4L, 1.0)))
    assert(rows(("nat", 3L)) === ((2L, 2L, 1.0)))
  }

  test("gate-reason census (q161): multi-fail docs count in every column; sums match q77") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gate").toString
    val good = ("word " * 25 + "the a is of and to in ").trim  // 32 toks, passes all gates
    Seq(
      (1L, "a", good),
      (2L, "a", "short"),              // fails len AND stopword
      (3L, "b", good)
    ).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.TextSim.q161_gate_reasons(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // doc 2 fails the length gate and the stopword gate: both columns get it
    assert(rows("a") === ((2L, 1L, 1L, 0L, 1L, 0L)))
    assert(rows("b") === ((1L, 1L, 0L, 0L, 0L, 0L)))

    // cross-query: per-source n_pass must sum to q77's keep count
    val pass = graft.queries.TextSim.q161_gate_reasons(spark, TestSpark.sf0001)
      .agg(sum("n_pass")).head.getLong(0)
    val q77keep = graft.queries.TextSim.q77_quality_gate(spark, TestSpark.sf0001)
      .filter(col("keep")).count()
    assert(pass === q77keep)
  }
}

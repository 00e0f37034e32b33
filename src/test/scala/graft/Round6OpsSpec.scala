package graft

import org.apache.spark.sql.functions._

import graft.analytics.Privacy
import graft.operators.Sampling
import graft.similarity.{Fusion, Similarity}
import graft.text.LineDedup

/** Round-6 second-batch operators: within-source boilerplate removal,
  * leakage-free component splits, hard-negative mining, k-anonymity,
  * and reciprocal-rank fusion. */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- boilerplate (q184)
  test("boilerplateCensus: within-source repeats go entirely, cross-source survive") {
    val docs = Seq(
      (1L, "s1", "a b"), (2L, "s1", "a b"), // boilerplate inside s1
      (3L, "s2", "a b"), // same line, different source: NOT boilerplate
      (4L, "s1", "c d")  // unique inside s1
    ).toDF("doc_id", "source", "text")
    val out = LineDedup.boilerplateCensus(docs, col("doc_id"), col("source"),
      col("text"), tokensPerLine = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    // ALL occurrences removed — including the first (unlike markFirstOccurrence)
    assert(out(1L)._1 === 0 && out(2L)._1 === 0)
    // cross-source repeat and unique line survive byte-identically
    val md5ab = java.security.MessageDigest.getInstance("MD5")
      .digest("a b".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(3L) === ((1L, md5ab)))
    assert(out(4L)._1 === 1L)
  }

  test("boilerplateCensus: below-threshold repeats survive") {
    val docs = Seq((1L, "s1", "a b"), (2L, "s1", "a b"))
      .toDF("doc_id", "source", "text")
    val out = LineDedup.boilerplateCensus(docs, col("doc_id"), col("source"),
      col("text"), tokensPerLine = 2, minDocs = 3)
    assert(out.filter(col("n_kept") === 1).count() === 2)
  }

  // --------------------------------------------- component split (q185)
  test("componentSplit: components move together, zero cross-split pairs") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val assigned = Sampling.componentSplit(docs, "doc_id", edges, 0.5)
    val rows = assigned.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // the 1-2-3 chain shares component 1, size 3, one split
    assert(Seq(1L, 2L, 3L).map(rows(_)._1).distinct === Seq(1L))
    assert(Seq(1L, 2L, 3L).map(rows(_)._2).distinct === Seq(3L))
    assert(Seq(1L, 2L, 3L).map(rows(_)._3).distinct.size === 1)
    // singletons are their own components
    assert(rows(4L) === ((4L, 1L, rows(4L)._3)))
    // the audit the split is built to satisfy: no pair straddles
    val assign = assigned.select(col("doc_id"),
      (col("split") === "holdout").as("is_test"))
    assert(Sampling.crossSplitPairs(edges, assign).count() === 0)
  }

  test("componentSplit: assignment is a pure function of the data") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val edges = Seq((1L, 2L)).toDF("id_a", "id_b")
    val a = Sampling.componentSplit(docs, "doc_id", edges, 0.3).collect().toSet
    val b = Sampling.componentSplit(docs.repartition(7), "doc_id", edges, 0.3)
      .collect().toSet
    assert(a === b)
  }

  // ---------------------------------------------- hard negatives (q186)
  test("hardNegatives: only other-label neighbors, exact cosine order") {
    val vecs = Seq(
      (0L, Array(1f, 0f), 0), // query
      (1L, Array(1f, 0.01f), 0), // same label: nearest but excluded
      (2L, Array(1f, 0.1f), 1), // hard negative (closest other-label)
      (3L, Array(0f, 1f), 1) // easy negative
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(vecs, vecs.filter(col("vec_id") === 0),
      k = 2).orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 3L)) // neighbor_id order
    assert(out.map(_.getInt(3)).forall(_ === 1)) // never the query's label
  }

  // -------------------------------------------------- k-anonymity (q187)
  test("kAnonymityHistogram: class-size mass accounts for every row") {
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 1), ("b", 1), ("c", 2))
      .toDF("seg", "n")
    val h = Privacy.kAnonymityHistogram(df, Seq(col("seg"), col("n")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(h === Map(1L -> ((1L, 1L)), 2L -> ((1L, 2L)), 3L -> ((1L, 3L))))
    assert(h.values.map(_._2).sum === df.count())
  }

  test("atRiskRows: exactly the members of small classes, tagged with k") {
    val df = Seq(("a", 1), ("a", 1), ("b", 1), ("c", 2))
      .toDF("seg", "n")
    val risky = Privacy.atRiskRows(df, Seq(col("seg"), col("n")), minK = 2)
    val segs = risky.select("seg").as[String].collect().sorted
    assert(segs.toSeq === Seq("b", "c"))
    assert(risky.select("class_k").as[Long].collect().forall(_ === 1L))
  }

  // ---------------------------------------------------- RRF fusion (q188)
  test("rrf: both-list doc outranks single-list docs; terms are exact") {
    val lex = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("query_id", "doc_id", "rank")
    val dense = Seq((0L, 10L, 2L), (0L, 12L, 1L)).toDF("query_id", "doc_id", "rank")
    val out = Fusion.rrf(Seq(lex, dense), topK = 3).orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(10L, 12L, 11L))
    val both = out.head
    assert(both.getLong(3) ===
      math.round(1e6 / 61) + math.round(1e6 / 62)) // rrf_micro exact
    assert(both.getLong(4) === 2L) // n_lists
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
  }

  // ------------------------------------------- embedding outliers (q189)
  test("labelZscoreOutliers: the planted outlier ranks first, constant dims are 0") {
    val base = (0L until 20L).map { i =>
      (i, Array(1f + (i % 3) * 0.01f, 0.5f, 2f), 0)
    }
    // vec 99: wildly off in dim 0 within the same label; dim 2 constant
    val vecs = (base :+ ((99L, Array(9f, 0.5f, 2f), 0))).toDF("vec_id", "embedding", "label")
    val out = graft.similarity.Similarity.labelZscoreOutliers(vecs, topK = 3)
      .collect()
    assert(out.head.getLong(0) === 99L)
    // a repartition must not change the census (order-free integer sums)
    val out2 = graft.similarity.Similarity
      .labelZscoreOutliers(vecs.repartition(7), topK = 3).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ===
      out2.map(r => (r.getLong(0), r.getLong(2))).toSeq)
  }

  test("labelZscoreOutliers: stats never cross labels") {
    // two labels with identical within-label constant vectors: zero
    // variance everywhere -> every z2 is 0 even though the labels differ
    val vecs = (Seq((1L, Array(1f, 1f), 0), (2L, Array(1f, 1f), 0),
      (3L, Array(5f, 5f), 1), (4L, Array(5f, 5f), 1)))
      .toDF("vec_id", "embedding", "label")
    val out = graft.similarity.Similarity.labelZscoreOutliers(vecs, topK = 10)
    assert(out.select("z2_micro").as[Long].collect().forall(_ === 0L))
  }

  // ------------------------------------------- source report card (q190)
  test("q190 report card: row mass conserved, ratios bounded") {
    val card = graft.queries.Mining.q190_source_report_card(spark, TestSpark.sf0001)
    val rows = card.collect()
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("pass_micro") <= 1000000L)
      assert(r.getAs[Long]("dup_micro") <= 1000000L)
      val q = r.getAs[Double]("mean_qscore")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[Long]("top_lang_docs") <= r.getAs[Long]("n_docs"))
    }
  }

  // ------------------------------------------------ ingest census (q191)
  test("ingestCensus: exact per-cell old/new mass and ratios") {
    val assigned = Seq(
      (1L, 0), (2L, 0), (3L, 0), (4L, 0), // cell 0: 4 old
      (10L, 0), // cell 0: 1 new
      (5L, 1), (11L, 1), (12L, 1) // cell 1: 1 old, 2 new
    ).toDF("vec_id", "cell")
    val idx = graft.similarity.Ivf.Index(Array(Array(0.0), Array(1.0)), assigned)
    val out = graft.similarity.Ivf
      .ingestCensus(idx, col("vec_id") >= 10L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(0L) === ((4L, 1L, 250000L, 333333L))) // 1/4 growth, 1/3 of new
    assert(out(1L) === ((1L, 2L, 2000000L, 666666L)))
  }

  // ------------------------------------------------- water-filling (q192)
  test("waterfillAllocation: closed-form water level, exact fill") {
    val sup = Seq(("a", 10L), ("b", 20L), ("c", 70L)).toDF("src", "n")
    val out = Sampling.waterfillAllocation(sup, col("src"), col("n"), 60L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    // sorted (10,20,70): lambda = (60-30)/1 = 30 -> allocs 10+20+30 = 60
    assert(out === Map("a" -> ((10L, false)), "b" -> ((20L, false)),
      "c" -> ((30L, true))))
  }

  test("waterfillAllocation: budget >= total supply caps nothing") {
    val sup = Seq(("a", 10L), ("b", 20L)).toDF("src", "n")
    val out = Sampling.waterfillAllocation(sup, col("src"), col("n"), 100L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out === Map("a" -> ((10L, false)), "b" -> ((20L, false))))
  }

  test("waterfillByFraction: never overfills, slack under group count") {
    val sup = (1L to 37L).map(i => (s"s$i", i * 13 % 97 + 1)).toDF("src", "n")
    val out = Sampling.waterfillByFraction(sup, col("src"), col("n"), 1, 2)
    val total = sup.agg(sum("n")).head.getLong(0)
    val alloc = out.agg(sum("alloc")).head.getLong(0)
    assert(alloc <= total / 2)
    assert(alloc > total / 2 - 37) // integer-div slack < n groups
  }

  // ----------------------------------------------- blocklist audit (q193)
  test("blocklistCensus: per-phrase doc counts, any-phrase flagged mass") {
    val docs = Seq(
      (1L, "s1", "the bad phrase appears here"),
      (2L, "s1", "bad phrase and worse phrase together"),
      (3L, "s1", "clean text"),
      (4L, "s2", "worse phrase only")
    ).toDF("doc_id", "source", "text")
    val out = graft.text.TextAnalysis.blocklistCensus(docs, col("source"),
      col("text"), Seq("bad phrase", "worse phrase"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out(("s1", "bad phrase")) === ((2L, 2L)))
    assert(out(("s1", "worse phrase")) === ((1L, 2L))) // doc 2 counted once per phrase
    assert(out(("s2", "worse phrase")) === ((1L, 1L)))
    assert(!out.contains(("s1", "clean text")))
  }

  // ------------------------------------------- truncation audit (q194)
  test("truncationOverlap: signal-in-prefix survives, signal-in-tail does not") {
    // dims 0-1 carry all structure; tail is constant -> truncation to 2 is lossless
    def v(a: Float, b: Float) = Array(a, b, 1f, 1f)
    val vecs = Seq((0L, v(1f, 0f)), (1L, v(0.9f, 0.1f)), (2L, v(0.5f, 0.5f)),
      (3L, v(0f, 1f))).toDF("vec_id", "embedding")
    val out = graft.similarity.Similarity
      .truncationOverlap(vecs, vecs.filter(col("vec_id") === 0), k = 2,
        truncDim = 2).collect().head
    assert(out.getLong(3) === 2L) // full overlap
    assert(out.getLong(1) === out.getLong(2)) // same top-1
    // now the signal lives in the TAIL: truncation to the first 2
    // (constant) dims destroys the ranking signal entirely
    def w(a: Float, b: Float) = Array(1f, 1f, a, b)
    val tail = Seq((0L, w(1f, 0f)), (1L, w(0.9f, 0.1f)), (2L, w(-1f, 0.2f)),
      (3L, w(0f, 1f))).toDF("vec_id", "embedding")
    val out2 = graft.similarity.Similarity
      .truncationOverlap(tail, tail.filter(col("vec_id") === 0), k = 1,
        truncDim = 2).collect().head
    // truncated ties resolve by neighbor_id, full precision by signal:
    // top-1 ids disagree, which is exactly the audit's warning signal
    assert(out2.getLong(1) === 1L)
    assert(out2.getLong(2) === 1L || out2.getLong(3) <= 1L)
  }

  test("rrf: fusion output is bounded by topK per query") {
    val lex = (1L to 20L).map(i => (0L, i, i)).toDF("query_id", "doc_id", "rank")
    assert(Fusion.rrf(Seq(lex), topK = 5).count() === 5)
  }

  test("BinaryQ.codes: word count derives from dim; bits exact at any size") {
    import graft.similarity.BinaryQ
    // 64 dims -> 2 words; 48 -> 2 (tail bits zero); 32 -> 1; 33 -> 2
    for ((dim, words) <- Seq(64 -> 2, 48 -> 2, 32 -> 1, 33 -> 2, 5 -> 1)) {
      val df = Seq((0L, Array.fill(dim)(0.5f))).toDF("vec_id", "embedding")
      val code = BinaryQ.codes(df).select("code").collect()
        .head.getSeq[Long](0)
      assert(code.length === words, s"dim=$dim")
      // all-positive vector: every in-range bit set, none past the end
      assert(code.map(java.lang.Long.bitCount).sum === dim, s"dim=$dim")
    }
    // Hamming over a non-64 dim: vectors differing in exactly 3 signs
    val a = Array.fill(48)(0.5f); val b = a.clone()
    b(0) = -1f; b(31) = -1f; b(40) = -1f // bits in both words
    val two = Seq((0L, a), (1L, b)).toDF("vec_id", "embedding")
    val c = BinaryQ.codes(two).orderBy("vec_id").collect()
      .map(_.getSeq[Long](1))
    val ham = c(0).zip(c(1))
      .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(ham === 3)
  }
}

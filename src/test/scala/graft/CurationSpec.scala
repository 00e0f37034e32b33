package graft

import org.apache.spark.sql.functions._

import graft.analytics.Drift
import graft.similarity.Sq
import graft.text.{Corpus, LineDedup}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ LineDedup

  lazy val docs = Seq(
    (0L, "a b c d e f"), // lines (L=3): "a b c", "d e f"
    (1L, "a b c x y z"), // "a b c" duplicates doc 0's first line
    (2L, "d e f d e f")  // both lines duplicate earlier occurrences
  ).toDF("doc_id", "text")

  test("line dedup keeps only the corpus-wide first occurrence of a line") {
    val out = LineDedup.dedupCensus(docs, col("doc_id"), col("text"), 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 2L, 2L), (1L, 2L, 1L), (2L, 2L, 0L)))
    // doc 1 reassembles to just its surviving second line
    val fp1 = out(1).getString(3)
    val expected = spark.sql("SELECT md5('x y z')").head().getString(0)
    assert(fp1 === expected)
    // a doc losing every line fingerprints the empty string
    val fp2 = out(2).getString(3)
    assert(fp2 === spark.sql("SELECT md5('')").head().getString(0))
  }

  test("line dedup first occurrence is ordered by (doc_id, position)") {
    val lines = LineDedup.markFirstOccurrence(
      LineDedup.chunkLines(docs, col("doc_id"), col("text"), 3))
    val keeps = lines.filter("keep").select("doc_id", "line_idx")
      .as[(Long, Int)].collect().toSet
    assert(keeps === Set((0L, 0), (0L, 1), (1L, 1)))
  }

  // ------------------------------------------------------------------ Sq

  lazy val vecs = Seq(
    (0L, Array(0.0f, 0.0f)), (1L, Array(0.1f, 0.0f)),
    (2L, Array(10.0f, 10.0f)), (3L, Array(10.1f, 10.0f)),
    (4L, Array(5.0f, 5.0f))
  ).toDF("vec_id", "embedding")

  test("Sq codes are dense in [0, bins) and neighbors share buckets") {
    val cb = Sq.fit(vecs, bins = 4)
    val enc = Sq.encode(vecs, cb, bins = 4)
    val codes = enc.orderBy("vec_id").select("codes")
      .as[Seq[Long]].collect()
    assert(codes.flatten.forall(c => c >= 0 && c < 4))
    assert(codes(0) === codes(1)) // 0.0 and 0.1 quantize together
    assert(codes(2) === codes(3))
    assert(codes(0) !== codes(2)) // far clusters get distinct codes
  }

  test("Sq ADC + exact re-rank recovers the true nearest neighbors") {
    val cb = Sq.fit(vecs, bins = 4)
    val enc = Sq.encode(vecs, cb, bins = 4)
    val out = Sq.adcTopK(enc, cb, vecs, vecs.filter(col("vec_id") === 0L),
      k = 2, rerank = 4, dim = 2, bins = 4)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 4L)) // true NN order
    // edist is the exact integer-micro-unit squared distance
    assert(out.head.getLong(4) === 100000L * 100000L) // (0.1·10⁶)²
  }

  // --------------------------------------------------------------- Drift

  test("KS statistic is exact: disjoint samples give D = 1") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 14L), ("b", 15L)).toDF("src", "v")
    val r = Drift.ksPairs(df, col("src"), col("v")).head()
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("ks_num") === 6L) // = n_a·n_b → D = 1.0
    assert(r.getAs[Double]("ks") === 1.0)
  }

  test("KS of identical distributions is 0; interleaved is fractional") {
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("src", "v")
    assert(Drift.ksPairs(same, col("src"), col("v"))
      .head().getAs[Long]("ks_num") === 0L)
    // a={1,3}, b={2,4}: max gap is 1/2 at v∈{1,3}
    val inter = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 4L))
      .toDF("src", "v")
    val r = Drift.ksPairs(inter, col("src"), col("v")).head()
    assert(r.getAs[Long]("ks_num") === 2L && r.getAs[Double]("ks") === 0.5)
  }

  // ------------------------------------------------------- moment states

  test("incremental moment state: merge of splits ≡ full recompute, any split") {
    import graft.analytics.Drift
    val e = Tables.load(spark, TestSpark.sf0001, "events")
    val full = Drift.momentState(e, col("event_type"), col("value"))
    for (cut <- Seq(100L, 2500L, 9999L)) {
      val hist = Drift.momentState(
        e.filter(col("event_id") < cut), col("event_type"), col("value"))
      val delta = Drift.momentState(
        e.filter(col("event_id") >= cut), col("event_type"), col("value"))
      val merged = Drift.mergeMomentStates(hist, delta)
      assert(merged.orderBy("key").collect().toSeq ===
        full.orderBy("key").collect().toSeq, s"cut=$cut")
    }
    // derived stats agree with Spark's own aggregates at 6dp
    val stats = Drift.momentStats(full).orderBy("key").collect()
    val direct = e.groupBy("event_type")
      .agg(round(avg("value"), 6).as("m"), round(variance("value"), 6).as("v"))
      .orderBy("event_type").collect()
    stats.zip(direct).foreach { case (s, d) =>
      assert(math.abs(s.getAs[Double]("mean") - d.getAs[Double]("m")) < 1e-5)
      assert(math.abs(s.getAs[Double]("variance") - d.getAs[Double]("v")) < 1e-5)
    }
  }

  // ---------------------------------------------------------------- chi2

  test("chi2: independent grid scores 0, perfect association scores N") {
    val indep = (for (a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 5)
      yield (a, b)).toDF("a", "b")
    val r0 = graft.analytics.Drift
      .chi2Independence(indep, col("a"), col("b")).head()
    assert(r0.getAs[Long]("dof") === 1L && r0.getAs[Double]("chi2") === 0.0)
    val dep = (for (i <- 1 to 10)
      yield if (i <= 5) ("x", "u") else ("y", "v")).toDF("a", "b")
    val r1 = graft.analytics.Drift
      .chi2Independence(dep, col("a"), col("b")).head()
    assert(r1.getAs[Long]("n") === 10L && r1.getAs[Double]("chi2") === 10.0)
  }

  // --------------------------------------------------------------- Logit

  test("Logit fit separates a margin-separated synthetic set exactly") {
    // y = 1 iff 2·x1 − x2 > 0, with a wide margin
    val rows = for (i <- -20 to 20; j <- -20 to 20
                    if math.abs(2.0 * i - j) > 5.0)
      yield (i.toDouble, j.toDouble, if (2.0 * i - j > 0) 1.0 else 0.0)
    val df = rows.toDF("x1", "x2", "y")
    val m = graft.ml.Logit.fit(df, Seq("x1", "x2"), "y")
    assert(m.coef(0) > 0 && m.coef(1) < 0) // signs recover the rule
    val acc = df.withColumn("p", m.scoreExpr)
      .filter((col("p") >= 0.5) === (col("y") === 1.0)).count()
    assert(acc === rows.size.toLong) // 100% on the training margin
  }

  test("Logit learns the quality gate from its own labels") {
    val d = graft.text.TextAnalysis.qualityFeatures(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      col("text"))
      .withColumn("y",
        (col("stopword_ratio") >= 0.05 && col("punct_ratio") <= 0.1)
          .cast("double"))
    val feats = Seq("avg_token_len", "stopword_ratio", "punct_ratio")
    val m = graft.ml.Logit.fit(d, feats, "y", iters = 10)
    val scored = d.withColumn("p", m.scoreExpr)
    val n = scored.count().toDouble
    val right = scored.filter((col("p") >= 0.5) === (col("y") === 1.0))
      .count().toDouble
    assert(right / n >= 0.95) // the linear rule is recoverable
  }

  // ------------------------------------------------------------ PageRank

  test("PageRank: one exact integer round on the path graph a–b–c") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val r = graft.graph.PageRank.run(edges, iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // S=1e12, N=3: r0 = 333333333333 each; base = 49999999999;
    // ends get 85%·(r0/2), the middle gets 85%·(r0 + r0) — by hand:
    assert(r === Seq((1L, 191666666665L), (2L, 616666666665L),
      (3L, 191666666665L)))
  }

  test("PageRank: the hub outranks leaves and mass stays conserved-ish") {
    val star = Seq((1L, 9L), (9L, 1L), (2L, 9L), (9L, 2L), (3L, 9L), (9L, 3L))
      .toDF("src", "dst")
    val r = graft.graph.PageRank.run(star, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r(9L) > r(1L) && r(1L) === r(2L) && r(2L) === r(3L))
    val total = r.values.sum
    assert(total <= 1000000000000L && total > 999999990000L) // floor losses only
  }

  test("shareEdges: symmetric pairs from shared lines, hot lines capped") {
    val d = Seq(
      (0L, "a b c"), (1L, "a b c"), // share line "a b c"
      (2L, "z z z"), (3L, "z z z"), (4L, "z z z") // 3 docs > maxDocs=2
    ).toDF("doc_id", "text")
    val lines = graft.text.LineDedup.chunkLines(d, col("doc_id"), col("text"), 3)
    val e = graft.text.LineDedup.shareEdges(lines, 2, 2)
      .as[(Long, Long)].collect().toSet
    assert(e === Set((0L, 1L), (1L, 0L))) // the z-clique is cut by the cap
  }

  // ----------------------------------------------------------------- Scd

  test("SCD2 collapses runs and chains validity intervals per key") {
    val log = Seq(
      (1L, 10L, "A"), (2L, 10L, "A"), (3L, 10L, "B"), (4L, 10L, "A"),
      (5L, 20L, "X")
    ).toDF("event_id", "user_id", "attr")
    val out = graft.operators.Scd
      .scd2(log, col("user_id"), col("attr"), col("event_id"),
        Seq(col("event_id")))
      .select("user_id", "attr", "valid_from", "valid_to", "is_current")
      .orderBy("user_id", "valid_from")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(out === Seq(
      (10L, "A", 1L, Some(3L), false), // run (1,2) collapses
      (10L, "B", 3L, Some(4L), false),
      (10L, "A", 4L, None, true), // value may recur; new interval opens
      (20L, "X", 5L, None, true)))
  }

  // --------------------------------------------------------- vocabGrowth

  test("vocab growth counts first occurrences and accumulates") {
    val df = Seq((0L, "x y"), (1L, "y z"), (2L, "x w v"))
      .toDF("doc_id", "text")
    val out = Corpus.vocabGrowth(df, col("doc_id"),
      graft.text.TextAnalysis.tokens(col("text")))
      .orderBy("first_doc")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((0L, 2L, 2L), (1L, 1L, 3L), (2L, 2L, 5L)))
  }

  test("quota select (q166): ceil quota per source; rare domain survives") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("quota").toString
    // source "big": 8 docs of varying quality; source "rare": 1 weak doc.
    // A global top-25% cut would drop the rare domain; the quota keeps
    // ceil(1 * 0.25) = 1 doc from it regardless of score.
    val filler = "the a is of and to in " // stopwords lift the score
    val big = (1L to 8L).map(i => (i, "big", ("word " * (30 + i.toInt) + filler).trim))
    val rare = Seq((100L, "rare", ("zz " * 40).trim)) // low score: no stopwords
    (big ++ rare).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Curation.q166_quota_select(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // big: ceil(8 * 0.25) = 2 kept; rare: ceil(0.25) = 1 kept
    assert(rows.count(_._2 == "big") === 2)
    assert(rows.count(_._2 == "rare") === 1)
    assert(rows.map(_._1).contains(100L))
  }

  // ------------------------------------------------- incremental span dedup

  test("incrementalCensus flags only spans present in the stored corpus") {
    val corpus = Seq(
      10L -> "c1 c2 c3 c4 c5 tail1 tail2 tail3").toDF("doc_id", "text")
    val batch = Seq(
      1L -> "c1 c2 c3 c4 fresh1 fresh2", //  4-token corpus span
      2L -> "b1 b2 b3 b4 n1 n2 b1 b2 b3 b4" // batch-internal dup ONLY
    ).toDF("doc_id", "text")
    val out = graft.text.SpanDedup
      .incrementalCensus(batch, corpus, col("doc_id"), col("text"), 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out === Seq(
      (1L, 1L, 4L), // the corpus span is found
      (2L, 0L, 0L))) // batch-internal repetition is NOT the ingest check's job
  }

  // ------------------------------------------------------- n-gram novelty

  test("noveltyCensus: first doc is fully novel, an exact copy fully stale") {
    import graft.text.TextAnalysis
    val d = Seq(
      0L -> "w1 w2 w3 w4 w5",
      1L -> "w1 w2 w3 w4 w5", // exact copy: zero new shingles
      2L -> "w3 w4 w5 z1 z2"  // "w3 w4 w5" already seen; other two novel
    ).toDF("doc_id", "text")
    val out = Corpus.noveltyCensus(d, col("doc_id"),
        TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Seq(
      (0L, 3L, 3L, 1000000L),
      (1L, 3L, 0L, 0L),
      (2L, 3L, 2L, 666666L)))
  }

  test("noveltyCensus: total novel shingles equal the distinct shingle count") {
    import graft.text.TextAnalysis
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val grams = TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3)
    val out = Corpus.noveltyCensus(docs, col("doc_id"), grams)
    val totalNew = out.agg(sum("n_new")).head().getLong(0)
    val distinctGrams = docs.select(explode(grams).as("g"))
      .select("g").distinct().count()
    assert(totalNew === distinctGrams,
      "every distinct shingle is novel in exactly one document")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

class BpeSpec extends SparkSpec {

  test("learnMerges: freq-weighted argmax with lexicographic tie-break") {
    import spark.implicits._
    // words: low x2, lower x1, newest x2
    val docs = Seq("low lower low", "newest newest").toDF("text")
    val merges = Bpe.learnMerges(docs, col("text"), 2)
    // step 1: "l o", "o w", "w e" all have freq 3 → lexicographic min
    assert(merges(0) === Bpe.Merge(1, "l o", 3L))
    // step 2: "lo w" (3) ties "w e" (3) → "lo w" < "w e"
    assert(merges(1) === Bpe.Merge(2, "lo w", 3L))
  }

  test("merge rewrite is leftmost-non-overlapping (documented run behavior)") {
    import spark.implicits._
    // "aaaa" → "a a a a": pair "a a" wins; one leftmost pass merges
    // every OTHER pair (the space between matches is consumed), so the
    // sequence becomes "aa a a" after round 1 — the documented
    // deviation from canonical BPE's per-pair re-scan, identical in
    // both engines (q103 pins the cross-engine agreement)
    val docs = Seq("aaaa").toDF("text")
    val merges = Bpe.learnMerges(docs, col("text"), 2)
    assert(merges(0) === Bpe.Merge(1, "a a", 3L))
    // round 2 counts over "aa a a": pairs "aa a" (1) and "a a" (1) →
    // lexicographic min "a a" wins with freq 1
    assert(merges(1) === Bpe.Merge(2, "a a", 1L))
  }

  test("encode: vocab replace-chain + join gives hand-computed token counts") {
    import spark.implicits._
    val docs = Seq((1L, "low lower low"), (2L, "newest newest")).toDF("id", "text")
    val merges = Seq(Bpe.Merge(1, "l o", 3L), Bpe.Merge(2, "lo w", 3L))
    // low → "l o w" → "lo w" → "low" (1 tok); lower → "lo w e r" →
    // "low e r" (3 tok); newest untouched (6 tok)
    val vocab = Bpe.encodedVocab(docs, col("text"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(vocab("low") === Seq("low"))
    assert(vocab("lower") === Seq("low", "e", "r"))
    assert(vocab("newest") === Seq("n", "e", "w", "e", "s", "t"))
    val counts = Bpe.tokenCounts(docs, col("id"), col("text"), merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: low(1) + lower(3) + low(1) = 5; doc 2: 6 + 6 = 12
    assert(counts === Map(1L -> 5L, 2L -> 12L))
  }

  test("fertility census (q154): hand-computed ratio; merges lower fertility") {
    import spark.implicits._
    val q = graft.queries.CorpusQueries.q154_bpe_fertility
    // Build a tiny two-source corpus through the real query path via a
    // temp parquet dir shaped like the testdata layout.
    val dir = java.nio.file.Files.createTempDirectory("fert").toString
    Seq(
      (1L, "a", "low lower low"),
      (2L, "a", "low low"),
      (3L, "b", "newest newest")
    ).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = q(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "b"))
    val bySource = rows.map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // 5 BPE rounds on this corpus collapse "low" fully; "lower" keeps a
    // short tail; "newest" compresses too — fertility stays >= 1 and the
    // whitespace denominators are exact.
    assert(bySource("a")._1 === 2L)   // docs in source a
    assert(bySource("a")._3 === 5L)   // ws tokens: 3 + 2
    assert(bySource("b")._3 === 2L)
    rows.foreach { r =>
      assert(r.getDouble(4) >= 1.0 - 1e-9)
      val expect = math.rint(r.getLong(2).toDouble / r.getLong(3) * 1e6) / 1e6
      assert(math.abs(r.getDouble(4) - expect) < 1e-9)
    }
  }

  test("fertility on real testdata: every source >= 1, fewer merges => higher fertility") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    def fert(rounds: Int): Double = {
      val merges = Bpe.learnMerges(docs, col("text"), rounds)
      val bpe = Bpe.tokenCounts(docs, col("doc_id"), col("text"), merges)
        .agg(sum("n_bpe_tokens")).head.getLong(0).toDouble
      val ws = docs.select(sum(size(split(trim(col("text")), "\\s+"))).cast("long"))
        .head.getLong(0).toDouble
      bpe / ws
    }
    val f0 = fert(0); val f5 = fert(5)
    assert(f0 > f5, s"more merges must compress: f0=$f0 f5=$f5")
    assert(f5 >= 1.0)
  }

  test("deterministic: two runs learn identical merges on real testdata") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val a = Bpe.learnMerges(docs, col("text"), 3)
    val b = Bpe.learnMerges(docs, col("text"), 3)
    assert(a === b)
    assert(a.map(_.step) === Seq(1, 2, 3))
  }
}

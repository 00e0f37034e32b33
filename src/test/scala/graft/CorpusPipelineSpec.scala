package graft

import org.apache.spark.sql.functions._

import graft.pipeline.CorpusPipeline
import graft.text.TextAnalysis

/** The composed cleaning pipeline end-to-end on real testdata. */
class CorpusPipelineSpec extends SparkSpec {

  test("clean: stages shrink monotonically, output is dedup'd and packed") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val res = CorpusPipeline.clean(docs, col("doc_id"), col("text"),
      CorpusPipeline.Config(minTokens = 10, sampleFraction = 0.8))

    val counts = res.stageCounts.toMap
    assert(res.stageCounts.map(_._1) ===
      Seq("input", "quality_gate", "exact_dedup", "near_dedup", "sample"))
    // each stage can only drop rows
    res.stageCounts.map(_._2).sliding(2).foreach {
      case Seq(a, b) => assert(b <= a)
      case _ =>
    }
    assert(counts("input") > 0 && counts("sample") > 0)

    val out = res.cleaned
    // no exact duplicates survive
    val n = out.count()
    val distinctFp = out
      .select(TextAnalysis.fingerprint(col("text")).as("fp")).distinct().count()
    assert(n === distinctFp)
    // packing respects the budget up to one oversize doc per batch
    val maxTok = out.agg(max("n_tokens")).head().getInt(0)
    val over = out.groupBy("batch_id").agg(sum("n_tokens").as("t"))
      .filter(col("t") >= 2048 + maxTok).count()
    assert(over === 0)
    // deterministic: same config → same output set
    val again = CorpusPipeline.clean(docs, col("doc_id"), col("text"),
      CorpusPipeline.Config(minTokens = 10, sampleFraction = 0.8))
    assert(out.select("doc_id", "batch_id").collect().toSet ===
      again.cleaned.select("doc_id", "batch_id").collect().toSet)
  }

  test("clean with a benchmark: contaminated docs are dropped before dedup") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val base = CorpusPipeline.clean(docs, col("doc_id"), col("text"),
      CorpusPipeline.Config(minTokens = 10))
    // an eval set built from slices of two surviving docs — those docs
    // (and any doc sharing the 5-gram) must vanish from the output
    val survivors = base.cleaned.select("doc_id").as[Long].collect().sorted.take(2)
    val bench = docs.filter(col("doc_id").isin(survivors: _*))
      .select(array_join(slice(split(lower(trim(col("text"))), "\\s+"), 3, 7), " ")
        .as("text"))
    val res = CorpusPipeline.clean(docs, col("doc_id"), col("text"),
      CorpusPipeline.Config(minTokens = 10, benchmark = Some(bench), decontamN = 5))
    val counts = res.stageCounts.toMap
    assert(res.stageCounts.map(_._1).contains("decontaminate"))
    assert(counts("decontaminate") < counts("quality_gate")) // it actually dropped
    val outIds = res.cleaned.select("doc_id").as[Long].collect().toSet
    survivors.foreach(s => assert(!outIds.contains(s), s"doc $s leaked through"))
  }

  test("clean with embeddings: semantic dedup drops cell-local near-dups only") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val embs = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val base = CorpusPipeline.clean(docs, col("doc_id"), col("text"),
      CorpusPipeline.Config(minTokens = 10))
    val res = CorpusPipeline.clean(docs, col("doc_id"), col("text"),
      CorpusPipeline.Config(minTokens = 10, embeddings = Some(embs)))
    val counts = res.stageCounts.toMap
    assert(res.stageCounts.map(_._1) === Seq("input", "quality_gate",
      "exact_dedup", "near_dedup", "semantic_dedup", "sample"))
    assert(counts("semantic_dedup") < counts("near_dedup")) // it actually dropped
    // only a subset was removed relative to the embedding-less run
    val baseIds = base.cleaned.select("doc_id").as[Long].collect().toSet
    val semIds = res.cleaned.select("doc_id").as[Long].collect().toSet
    assert(semIds.subsetOf(baseIds) && semIds.nonEmpty)
    // docs with no embedding row survive: re-run with embeddings
    // restricted to half the id space; docs above the cut can't be
    // judged, so every base survivor above the cut must remain
    val cut = 250L
    val resHalf = CorpusPipeline.clean(docs, col("doc_id"), col("text"),
      CorpusPipeline.Config(minTokens = 10,
        embeddings = Some(embs.filter(col("vec_id") < cut))))
    val halfIds = resHalf.cleaned.select("doc_id").as[Long].collect().toSet
    assert(baseIds.filter(_ >= cut).subsetOf(halfIds))
  }

  test("clean with line dedup: boilerplate lines vanish, texts rewritten") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val res = CorpusPipeline.clean(docs, col("doc_id"), col("text"),
      CorpusPipeline.Config(minTokens = 10, lineDedupTokens = Some(10)))
    assert(res.stageCounts.map(_._1).contains("line_dedup"))
    // after rewriting, no 10-token line may occur twice corpus-wide
    val lines = graft.text.LineDedup.chunkLines(
      res.cleaned, col("doc_id"), col("text"), 10)
    val dups = lines.groupBy("line").count().filter(col("count") > 1).count()
    assert(dups === 0L)
    // n_tokens was recounted from the rewritten text
    val bad = res.cleaned
      .filter(col("n_tokens") =!= graft.text.TextAnalysis.tokenCount(col("text")))
      .count()
    assert(bad === 0L)
  }

  test("clean with a classifier: scores gate the corpus") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    // a permissive model (large positive intercept) keeps everything...
    val keepAll = graft.ml.Logit.Model(
      Seq("stopword_ratio"), Array(0.0), intercept = 10.0)
    val resAll = CorpusPipeline.clean(docs, col("doc_id"), col("text"),
      CorpusPipeline.Config(minTokens = 10, classifier = Some(keepAll)))
    // ...a hostile one (large negative intercept) keeps nothing
    val dropAll = keepAll.copy(intercept = -10.0)
    val resNone = CorpusPipeline.clean(docs, col("doc_id"), col("text"),
      CorpusPipeline.Config(minTokens = 10, classifier = Some(dropAll)))
    val base = CorpusPipeline.clean(docs, col("doc_id"), col("text"),
      CorpusPipeline.Config(minTokens = 10))
    assert(resAll.stageCounts.toMap.apply("quality_gate") ===
      base.stageCounts.toMap.apply("quality_gate"))
    assert(resNone.stageCounts.toMap.apply("quality_gate") === 0L)
  }

  test("funnel census (q159): stage order, monotone attrition, input = table count") {
    val rows = graft.queries.TextSim.q159_pipeline_funnel(spark, TestSpark.sf0001)
      .collect()
    assert(rows.map(_.getString(1)).toSeq ===
      Seq("input", "quality_gate", "decontaminate", "exact_dedup", "near_dedup"))
    val counts = rows.map(_.getLong(2))
    assert(counts.head ===
      Tables.load(spark, TestSpark.sf0001, "documents").count())
    counts.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b, s"funnel must not grow: ${counts.mkString(",")}")
    }
    assert(counts.last > 0L)
  }
}

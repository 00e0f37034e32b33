package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.text.Packing

class PackingSamplingSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = (0L until 1000L).map(i => (i, 100 + (i % 7).toInt * 50))
    .toDF("doc_id", "n_tok")

  test("deterministicSample: stable membership, ~fraction kept") {
    val d = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val a = Sampling.deterministicSample(d, Seq("l_orderkey", "l_linenumber"), 0.3)
    val b = Sampling.deterministicSample(d, Seq("l_orderkey", "l_linenumber"), 0.3)
    assert(a.count() === b.count()) // reproducible
    val frac = a.count().toDouble / d.count()
    assert(frac > 0.25 && frac < 0.35, s"fraction $frac")
    // nested property: the 0.1 sample is a subset of the 0.3 sample
    val small = Sampling.deterministicSample(d, Seq("l_orderkey", "l_linenumber"), 0.1)
    assert(small.join(a, Seq("l_orderkey", "l_linenumber"), "left_anti").count() === 0)
  }

  test("stratifiedSample: per-stratum fractions honored") {
    val d = Tables.load(spark, TestSpark.sf0001, "documents")
    val sampled = Sampling.stratifiedSample(d, Seq("doc_id"), col("lang"),
      Map("en" -> 0.2), defaultFraction = 1.0)
    val before = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("en") < before("en")) // en downsampled
    (before.keySet - "en").foreach(l => assert(after(l) === before(l))) // others intact
  }

  test("withFolds: disjoint exhaustive folds, stable") {
    val folded = Sampling.withFolds(docs, Seq("doc_id"), 5)
    assert(folded.count() === 1000)
    val counts = folded.groupBy("fold").count().collect()
    assert(counts.length === 5)
    counts.foreach(r => assert(r.getLong(1) > 100, s"degenerate fold $r"))
  }

  test("packSequential: batches respect the budget (except oversize docs)") {
    val packed = Packing.packSequential(docs, col("n_tok"), 2048, Seq(col("doc_id")))
    val batches = packed.groupBy("batch_id")
      .agg(sum("n_tok").as("tot"), count(lit(1)).as("n"))
      .collect()
    assert(batches.map(_.getAs[Long]("n")).sum === 1000)
    // a batch may overflow only by less than its last doc's size (< 400)
    batches.foreach(r => assert(r.getAs[Long]("tot") < 2048 + 400, r.toString))
    // order-exactness: doc 0..k share batch 0 until the budget fills
    val first = packed.filter(col("batch_id") === 0)
      .agg(min("doc_id"), max("doc_id")).head()
    assert(first.getLong(0) === 0L)
  }

  test("packSharded: same totals, parallel shards, deterministic") {
    val packed = Packing.packSharded(docs, Seq("doc_id"), col("n_tok"), 2048, shards = 8)
    assert(packed.count() === 1000)
    val batchTotals = packed.groupBy("batch_id").agg(sum("n_tok").as("tot")).collect()
    batchTotals.foreach(r => assert(r.getAs[Long]("tot") < 2048 + 400))
    val again = Packing.packSharded(docs, Seq("doc_id"), col("n_tok"), 2048, shards = 8)
    assert(packed.select("doc_id", "batch_id").collect().toSet ===
      again.select("doc_id", "batch_id").collect().toSet)
  }

  test("shuffleShards: exact permutation, balanced round-robin, seed-sensitive") {
    val docs = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val s1 = graft.operators.Sampling.shuffleShards(docs, Seq("doc_id"), 8)
    val rows = s1.select("doc_id", "pos", "shard")
      .as[(Long, Long, Long)].collect()
    // pos is a bijection onto 1..n
    assert(rows.map(_._2).sorted.toSeq === (1L to 100L))
    // round-robin: shard = (pos-1) mod 8, so counts balance to +-1
    assert(rows.forall { case (_, p, sh) => sh === (p - 1) % 8 })
    val counts = rows.groupBy(_._3).view.mapValues(_.size).values.toSet
    assert(counts.subsetOf(Set(12, 13)))
    // deterministic rerun, different under another seed
    val again = graft.operators.Sampling.shuffleShards(docs, Seq("doc_id"), 8)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(rows.forall { case (id, p, _) => again(id) === p })
    val other = graft.operators.Sampling
      .shuffleShards(docs, Seq("doc_id"), 8, seed = 7L)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(rows.exists { case (id, p, _) => other(id) !== p })
  }

  test("chunk: sliding windows cover every token; overlap and tail are exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 toks
      (2L, "a b c")                           // shorter than one chunk
    ).toDF("doc_id", "text")
    val rows = Packing.chunk(docs, col("doc_id"), col("text"),
        chunkSize = 8, overlap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2))
    // doc 1: starts 1 and 5 (stop = n - overlap = 6); doc 2: one short chunk
    assert(rows === Array(
      (1L, 0L, "t1 t2 t3 t4 t5 t6 t7 t8", 8L),
      (1L, 1L, "t5 t6 t7 t8 t9 t10", 6L),
      (2L, 0L, "a b c", 3L)))
    // overlap 0: chunks partition the tokens exactly
    val flat = Packing.chunk(docs, col("doc_id"), col("text"), chunkSize = 4)
      .groupBy("doc_id").agg(sum("n_tokens").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flat === Map(1L -> 10L, 2L -> 3L))
  }

  test("packing efficiency (q164 shape): hand-computed fill rate and overflow") {
    import spark.implicits._
    // budget 2048, docs of 1000/1500/3000 tokens in id order:
    // doc1 starts at 0 -> batch 0; doc2 starts at 1000 -> batch 0
    // (batch 0 totals 2500, overflowing); doc3 starts at 2500 ->
    // batch 1 (3000 tokens, its own overflowing batch)
    val d = Seq((1L, 1000L), (2L, 1500L), (3L, 3000L)).toDF("doc_id", "n_tok")
    val batches = Packing.packSequential(d, col("n_tok"), 2048, Seq(col("doc_id")))
      .groupBy("batch_id").agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tok"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(batches === Map(0L -> ((2L, 2500L)), 1L -> ((1L, 3000L))))
    // the census over those batches: fill = 5500/(2*2048)
    assert(math.abs(5500.0 / 4096 - 1.342773) < 1e-6)
  }
}

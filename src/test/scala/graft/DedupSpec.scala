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
}

package graft

import org.apache.spark.sql.functions._

import graft.dedup.BloomLineDedup

class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, TestSpark.sf0001, "documents")
  private lazy val bucket =
    conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 10
  private lazy val batch = docs.filter(bucket === 0)
  private lazy val corpus = docs.filter(bucket =!= 0)

  test("census equals the plain (bloom-free) semi-join decision") {
    val got = BloomLineDedup
      .census(batch, corpus, col("doc_id"), col("text"), 10)
      .orderBy("doc_id").collect()
    // ground truth without any prefilter
    val bl = graft.text.LineDedup.chunkLines(batch, col("doc_id"), col("text"), 10)
    val cl = graft.text.LineDedup.chunkLines(corpus, col("doc_id"), col("text"), 10)
      .select("line").distinct()
    val want = bl.join(cl.withColumn("dup", lit(true)), Seq("line"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"), count(when(col("dup"), 1)).as("n_dup"))
      .orderBy("doc_id").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) === w.getLong(0))
      assert(g.getLong(1) === w.getLong(1), s"n_lines for doc ${g.getLong(0)}")
      assert(g.getLong(2) === w.getLong(2), s"n_dup for doc ${g.getLong(0)}")
      assert(g.getLong(3) === g.getLong(1) - g.getLong(2))
    }
    assert(got.map(_.getLong(2)).sum > 0, "no duplicate lines crossed the " +
      "batch/corpus split — the census is vacuous at this SF")
  }

  test("prefilter audit: zero false negatives, bounded false positives") {
    val audit = BloomLineDedup
      .prefilterAudit(batch, corpus, col("doc_id"), col("text"), 10, fpp = 0.01)
      .agg(sum("n_lines").as("lines"), sum("n_bloom_pos").as("pos"),
        sum("n_dup").as("dup"), sum("n_false_neg").as("fneg"))
      .collect()(0)
    val (lines, pos, dup, fneg) =
      (audit.getLong(0), audit.getLong(1), audit.getLong(2), audit.getLong(3))
    assert(fneg === 0L, "Bloom filter produced false negatives")
    assert(pos >= dup, "bloom-positives cannot undercount true dups")
    // at fpp=1% the extra confirm-join traffic beyond true dups should
    // stay a small fraction of the batch (wide margin: 10%)
    assert(pos - dup <= math.max(5L, lines / 10),
      s"false-positive traffic blew past fpp: pos=$pos dup=$dup lines=$lines")
  }

  test("empty corpus: everything is new, nothing joins") {
    val out = BloomLineDedup
      .census(batch, corpus.filter(lit(false)), col("doc_id"), col("text"), 10)
      .agg(sum("n_dup")).collect()(0)
    assert(out.getLong(0) === 0L)
  }
}

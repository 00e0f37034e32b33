package graft

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)), // near 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)), // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)), // opposite of 0
    (4L, Array(0.98f, 0.15f, 0.05f, 0.0f)) // near 0
  ).toDF("vec_id", "embedding")

  test("dot / l2Norm / cosine column algebra") {
    val r = vecs.filter(col("vec_id") === 0)
      .crossJoin(vecs.filter(col("vec_id") === 3).select(col("embedding").as("b")))
      .select(
        Similarity.dot(col("embedding"), col("b")).as("d"),
        Similarity.l2Norm(col("embedding")).as("n"),
        Similarity.cosine(col("embedding"), col("b")).as("c")).head()
    assert(r.getDouble(0) === -1.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getDouble(2) === -1.0)
  }

  test("bruteForceTopK ranks by cosine with id tie-break") {
    val top = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(top.toSeq === Seq((0L, 1L, 1L), (0L, 2L, 4L)))
  }

  test("LSH topK finds the exact nearest neighbor for clustered vectors") {
    val got = Similarity.lshTopK(vecs, vecs.filter(col("vec_id") === 0), k = 1,
      dim = 4, planes = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // vec 1 shares nearly every hyperplane side with vec 0 → must appear
    assert(got.nonEmpty && got.head === (0L -> 1L))
  }

  test("embeddingNearDups finds the near-identical pairs only") {
    val rows = Similarity.embeddingNearDups(vecs, threshold = 0.95, dim = 4,
      planes = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = rows.toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 2L)))
    assert(!pairs.contains((0L, 3L)))
    // the candidate dedup moved AFTER the cosine verify (r13: the
    // pre-verify distinct was the 2.6 GB sf1 spiller) — a near-identical
    // pair collides in EVERY band and must still emit exactly one row
    assert(rows.length === pairs.size,
      s"duplicate pair rows: ${rows.mkString(",")}")
  }

  test("semDedup: within-cell pruning with EXISTS-vs-lower-id semantics") {
    import spark.implicits._
    // cell 0 chain: a=(1,0) ~ b=rot20° (cos .940 ≥ .9), b ~ c=rot40°
    // (cos .940), but a !~ c (cos .766). EXISTS-semantics: b dropped by
    // a, and c dropped by b EVEN THOUGH b itself is dropped (sequential
    // greedy would keep c — this pins the parallel form). d duplicates
    // a but sits in cell 1, so the check is cell-local and keeps it.
    val rows = Seq(
      (1L, 0, Array(1f, 0f)),
      (2L, 0, Array(0.93969f, 0.34202f)),
      (3L, 0, Array(0.76604f, 0.64279f)),
      (4L, 1, Array(1f, 0f)))
    val df = rows.toDF("vec_id", "cell", "embedding")
    val got = Similarity.semDedup(df, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
  }

  test("LSH recall vs brute force on real embeddings (sf0.001)") {
    val e = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(e, q, k = 1)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val lsh = Similarity.lshTopK(e, q, k = 5, dim = 64, planes = 16, bands = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (k2, rs) => k2 -> rs.map(_.getLong(2)).toSet }
    // generous banding (8 bands of 2 bits) → top-1 should usually be found;
    // assert at least half the queries recall their true nearest neighbor
    val hits = brute.count { case (qid, nn) => lsh.getOrElse(qid, Set.empty).contains(nn) }
    assert(hits >= brute.size / 2, s"recall $hits/${brute.size}")
  }

  test("embedDecontam: an exact copy of a benchmark vector is flagged") {
    val e = Tables.load(spark, TestSpark.sf0001, "embeddings")
    // benchmark = every 25th vector; corpus vector 26 replaced by an
    // exact copy of benchmark vector 25 -> cosine 1.0, must be flagged
    val bench = e.filter(col("vec_id") % 25 === 0)
    val copyOf25 = bench.filter(col("vec_id") === 25)
      .select(org.apache.spark.sql.functions.lit(26L).as("vec_id"),
        col("embedding"), col("label"))
    val corpus = e.filter(col("vec_id") % 25 =!= 0)
      .filter(col("vec_id") =!= 26).unionByName(copyOf25)
    val out = Similarity.embedDecontam(corpus, bench, 0.9, dim = 64)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2), r.getBoolean(3)))))
      .toMap
    assert(out(26L).isDefined, "exact benchmark copy found no candidate")
    val (bid, sim, flagged) = out(26L).get
    assert(bid === 25L && sim === 1.0 && flagged,
      s"copy of benchmark 25 reported ($bid, $sim, $flagged)")
    // benchmark members never appear as corpus rows
    assert(!out.contains(25L))
    // every corpus row gets a verdict row, matched or not
    assert(out.size === corpus.count())
  }
}

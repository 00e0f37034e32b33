package graft

import org.apache.spark.sql.functions._

/** Dataset-integrity operators (q139–q142): split-leakage pairs,
  * embedding-health census, and the fixed-k per-group deterministic
  * draw — each pinned on hand-computable fixtures.
  */
class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("crossSplitPairs: only pairs straddling the split survive") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    // 1,3 train; 2,4 test -> (1,2) and (2,3) straddle; (3,4) does too
    val assign = Seq((1L, 0), (2L, 1), (3L, 0), (4L, 1))
      .toDF("doc_id", "is_test")
    val got = graft.operators.Sampling.crossSplitPairs(pairs, assign)
      .orderBy("id_a", "id_b").as[(Long, Long, Long, Long)].collect()
    assert(got === Array((1L, 2L, 0L, 1L), (2L, 3L, 1L, 0L), (3L, 4L, 0L, 1L)))
  }

  test("crossSplitPairs: same-side pairs filtered out") {
    val pairs = Seq((1L, 3L)).toDF("id_a", "id_b")
    val assign = Seq((1L, 0), (3L, 0)).toDF("doc_id", "is_test")
    assert(graft.operators.Sampling.crossSplitPairs(pairs, assign).count() === 0)
  }

  test("groupSample: exactly k per group, bucket order, deterministic") {
    val df = (1L to 40L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("doc_id", "grp_col")
    val s1 = graft.operators.Sampling
      .groupSample(df, "doc_id", col("grp_col"), 3)
      .orderBy("grp", "rn").as[(String, Long, Long, Long)].collect()
    assert(s1.count(_._1 == "even") === 3 && s1.count(_._1 == "odd") === 3)
    // rn follows ascending bucket within each group
    s1.groupBy(_._1).values.foreach { g =>
      val byRn = g.sortBy(_._2)
      assert(byRn.map(_._4).sameElements(byRn.map(_._4).sorted))
    }
    // deterministic: second run identical
    val s2 = graft.operators.Sampling
      .groupSample(df, "doc_id", col("grp_col"), 3)
      .orderBy("grp", "rn").as[(String, Long, Long, Long)].collect()
    assert(s1 === s2)
  }

  test("groupSample: k larger than the group returns the whole group") {
    val df = Seq((1L, "a"), (2L, "a")).toDF("doc_id", "g")
    val got = graft.operators.Sampling.groupSample(df, "doc_id", col("g"), 5)
    assert(got.count() === 2)
  }

  test("topComponent: recovers the known axis and variance of a line") {
    // points on the line t*(0.6, 0.8): centered cov has eigenvector
    // (0.6, 0.8), eigenvalue = variance along the line = mean(t²) -
    // mean(t)² over t ∈ {5, 10, 15} = 50/3
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(6.0f, 8.0f)),
      (3L, Array(9.0f, 12.0f))).toDF("vec_id", "embedding")
    val got = graft.ml.Pca.topComponent(spark, df, col("embedding"))
      .orderBy("idx").as[(Int, Double, Double)].collect()
    assert(got.length === 2)
    assert(math.abs(got(0)._2 - 0.6) < 1e-4 && math.abs(got(1)._2 - 0.8) < 1e-4)
    assert(math.abs(got(0)._3 - 50.0 / 3) < 1e-2)
  }

  test("topComponent: deterministic across runs") {
    val df = Seq(
      (1L, Array(1.0f, 0.2f, -0.5f)),
      (2L, Array(-0.3f, 0.9f, 0.1f)),
      (3L, Array(0.7f, -0.4f, 0.6f)),
      (4L, Array(0.2f, 0.5f, -0.8f))).toDF("vec_id", "embedding")
    val a = graft.ml.Pca.topComponent(spark, df, col("embedding"))
      .orderBy("idx").as[(Int, Double, Double)].collect()
    val b = graft.ml.Pca.topComponent(spark, df, col("embedding"))
      .orderBy("idx").as[(Int, Double, Double)].collect()
    assert(a === b)
    // unit norm (to quantization precision)
    assert(math.abs(a.map(r => r._2 * r._2).sum - 1.0) < 1e-4)
  }

  test("embeddingHealth: zero vector counted, norms exact") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f), 0),   // norm 5
      (2L, Array(0.0f, 0.0f), 0),   // zero vector
      (3L, Array(1.0f, 0.0f), 1))   // norm 1
      .toDF("vec_id", "embedding", "label")
    val got = graft.similarity.Similarity
      .embeddingHealth(df, col("label"), col("embedding"))
      .orderBy("grp")
      .as[(Int, Long, Long, Long, Long, Double, Double, Double)].collect()
    assert(got === Array(
      (0, 2L, 2L, 2L, 1L, 2.5, 0.0, 5.0),
      (1, 1L, 2L, 2L, 0L, 1.0, 1.0, 1.0)))
  }
}

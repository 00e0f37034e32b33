package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Pins for [[graft.dedup.Dedup.connectedComponentsConverged]] — the
  * zero-changes-fixpoint production variant of the fixed-iteration
  * oracle form: equal wherever the diameter fits the fixed budget,
  * correct where it doesn't, and O(log diameter) rounds via pointer
  * jumping. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(pairs: Seq[(Long, Long)]) =
    pairs.toDF("id_a", "id_b")

  test("diameter-12 chain: fixed-8 under-merges, converged labels the whole chain") {
    val chain = edgesDf((0L until 12L).map(i => (i, i + 1)))
    val fixed = Dedup.connectedComponents(chain, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // premise: the fixed budget genuinely under-labels this shape —
    // min-label propagation moves one hop per round, so node 12 can
    // only have seen labels within 8 hops
    assert(fixed(12L) > 0L, "fixed-8 should under-merge a diameter-12 chain")
    val (conv, rounds, converged) = Dedup.convergedWithRounds(chain, 64,
      _.localCheckpoint(true))
    val labels = conv.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.values.toSet === Set(0L), s"one component, got $labels")
    assert(labels.size === 13)
    assert(converged, "fixpoint flag must be set when zero-changes reached")
    // pointer jumping: effective distance doubles per round
    assert(rounds <= 6, s"expected O(log d) rounds, took $rounds")
  }

  test("exhausting maxRounds before the fixpoint throws, never under-merges silently") {
    // diameter-12 chain again, but with a 1-round budget: propagation
    // cannot finish, so the production API must refuse the labels
    val chain = edgesDf((0L until 12L).map(i => (i, i + 1)))
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponentsConverged(chain, maxRounds = 1)
    }
    assert(ex.getMessage.contains("under-merged"))
    // the raw loop reports the same condition as a flag instead
    val (_, rounds, converged) =
      Dedup.convergedWithRounds(chain, 1, _.localCheckpoint(true))
    assert(rounds === 1 && !converged)
  }

  test("near-clique corpora: converged ≡ fixed-iteration (the oracle shape)") {
    // three cliques + a bridge pair + an isolated edge — diameters ≤ 3
    val cliques = for {
      (base, size) <- Seq((100L, 5), (200L, 4), (300L, 6))
      i <- 0 until size; j <- (i + 1) until size
    } yield (base + i, base + j)
    val pairs = cliques ++ Seq((104L, 200L), (900L, 901L))
    val e = edgesDf(pairs)
    val fixed = Dedup.connectedComponents(e, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val conv = Dedup.connectedComponentsConverged(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(conv === fixed)
    // and the bridge merged the two cliques under the global min
    val m = conv.toMap
    assert(m(203L) === 100L && m(104L) === 100L)
    assert(m(901L) === 900L && m(305L) === 300L)
  }

  test("converged components on the real near-dup graph match the fixed form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.simhashNearDups(docs, col("doc_id"), col("text"))
      .select(col("id_a"), col("id_b"))
    val fixed = Dedup.connectedComponents(pairs, iters = 8)
    val conv = Dedup.connectedComponentsConverged(pairs)
    assert(fixed.exceptAll(conv).isEmpty && conv.exceptAll(fixed).isEmpty)
  }
}

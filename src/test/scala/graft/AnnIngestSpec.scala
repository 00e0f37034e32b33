package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.similarity.Ivf
import graft.streaming.AnnIngest

/** Streaming ANN index maintenance: batches assign against the STORED
  * centroids, the fenced table stays queryable between micro-batches,
  * and the q191 drift census triggers a retrain exactly when the
  * documented growth AND share thresholds are crossed.
  */
class AnnIngestSpec extends SparkSpec {
  import spark.implicits._

  // four well-separated cluster anchors in 4-dim space
  private def anchor(c: Int): Array[Float] = {
    val a = Array.fill(4)(0.0f); a(c) = 10.0f; a
  }
  private def near(c: Int, j: Int): Array[Float] = {
    val a = anchor(c).clone(); a((c + 1) % 4) += 0.1f * (j + 1); a
  }

  test("retrainDecision: fires only when share AND growth cross together") {
    val census = Seq(
      // (cell, n_old, n_new, growth_micro, share_new_micro)
      (0L, 8L, 1L, Some(125000L), 250000L),   // share hit, growth low  -> no
      (1L, 2L, 1L, Some(500000L), 100000L),   // growth hit, share low  -> no
      (2L, 8L, 0L, Some(0L), 0L)              // idle                  -> no
    ).map { case (c, o, n, g, s) => (c, o, n, g.get, s) }
      .toDF("cell", "n_old", "n_new", "growth_micro", "share_new_micro")
    val calm = AnnIngest.retrainDecision(census, AnnIngest.Thresholds())
    assert(!calm.retrain && calm.triggeredCells.isEmpty)

    val hot = Seq((3L, 9L, 12L, Some(1333333L), 900000L))
      .map { case (c, o, n, g, s) => (c, o, n, g.get, s) }
      .toDF("cell", "n_old", "n_new", "growth_micro", "share_new_micro")
    val fired = AnnIngest.retrainDecision(hot, AnnIngest.Thresholds())
    assert(fired.retrain && fired.triggeredCells === Seq(3L))

    // an empty cell coming alive = infinite growth: null growth + share
    val alive = spark.sql(
      "SELECT 2L AS cell, 0L AS n_old, 5L AS n_new, " +
        "CAST(NULL AS BIGINT) AS growth_micro, 600000L AS share_new_micro")
    assert(AnnIngest.retrainDecision(alive, AnnIngest.Thresholds()).retrain)
  }

  test("index stays queryable across micro-batches; drift triggers exactly one retrain") {
    val dir = Files.createTempDirectory("graft_ann_ingest")
    val table = s"$dir/index"
    val m = new AnnIngest.Maintainer(spark, table)

    val src = MemoryStream[(Long, Array[Float])](spark)
    val q = m.start(src.toDF().toDF("vec_id", "embedding"),
      s"$dir/ckpt")
    try {
      // bootstrap: 32 vectors in 4 clean clusters -> autoNlist = 4
      src.addData((0 until 32).map(i => (i.toLong, near(i % 4, i / 4))): _*)
      q.processAllAvailable()
      assert(m.retrainCount === 0)
      assert(m.centroids.length === 4)
      val idx1 = m.index()
      assert(idx1.assigned.count() === 32)
      // queryable between batches: exact cluster-mates come back first
      val q1 = Ivf.topK(idx1,
        idx1.assigned.filter(col("vec_id") === 0L), k = 3, nprobe = 1)
      assert(q1.count() === 3)
      assert(q1.select("neighbor_id").as[Long].collect()
        .forall(_ % 4 === 0), "top-3 of a cluster-0 vector must be cluster-0")

      // calm batch: 4 vectors, one per existing cluster -> share hits
      // 250k per cell but growth stays at 125k -> NO retrain
      src.addData((100 until 104).map(i => (i.toLong, near(i % 4, 7))): _*)
      q.processAllAvailable()
      assert(m.retrainCount === 0, "uniform growth must not retrain")
      assert(m.index().assigned.count() === 36)

      // drifted batch: 12 vectors at a brand-new far anchor -> one cell
      // absorbs share 1.0 with growth >> threshold -> exactly one retrain
      // is STAGED. The triggering batch itself never pays Lloyd's (bounded
      // batch latency): at its boundary the count is still 0 and the
      // retrain is pending on the trainer thread.
      val far = Array(7.0f, 7.0f, 7.0f, 7.0f)
      src.addData((200 until 212).map { i =>
        val v = far.clone(); v(i % 4) += 0.05f * (i - 199); (i.toLong, v)
      }: _*)
      q.processAllAvailable()
      assert(m.retrainCount === 0,
        "the triggering batch must stage the retrain, not pay for it")
      assert(m.retrainPending, "drift must leave a retrain pending")
      // the index stays queryable under the OLD model while training runs
      assert(m.index().assigned.count() === 48)

      // a batch that lands while the retrain is in flight (or right at
      // the adoption boundary) must survive the model swap
      src.addData((300 until 304).map(i => (i.toLong, near(i % 4, 9))): _*)
      q.processAllAvailable()
      m.awaitRetrainQuiesced()
      assert(m.retrainCount === 1, "concentrated drift must retrain once")
      assert(!m.retrainPending)
      val idx2 = m.index()
      // no lost vectors across the swap: 32 + 4 + 12 + 4
      assert(idx2.assigned.count() === 52)
      // every stored cell agrees with the ADOPTED model: the swap
      // re-assigned the whole table, including rows ingested mid-train
      val reassigned = Ivf.assign(
        idx2.assigned.drop("cell"), m.centroids)
        .select(col("vec_id"), col("cell").as("expected"))
      val disagree = idx2.assigned.select(col("vec_id"), col("cell"))
        .join(reassigned, "vec_id")
        .filter(col("cell") =!= col("expected")).count()
      assert(disagree === 0L,
        "stored cells must match the adopted model's routing")
      // post-retrain the new region has its own cell: a far query's
      // nearest cell holds only far vectors
      val q2 = Ivf.topK(idx2,
        idx2.assigned.filter(col("vec_id") === 200L), k = 3, nprobe = 1)
      assert(q2.select("neighbor_id").as[Long].collect().forall(_ >= 200L),
        "after retrain the drifted region must be self-contained")
    } finally q.stop()

    // restart recovery: a NEW maintainer over the same table resumes
    // with the persisted model, epoch and retrain count — not a
    // re-bootstrap that would mix fresh centroids with stale cells
    val m2 = new AnnIngest.Maintainer(spark, table)
    assert(m2.retrainCount === 1, "retrain count must survive a restart")
    assert(m2.centroids.length === m.centroids.length)
    assert(m2.centroids.map(_.toSeq).toSeq === m.centroids.map(_.toSeq).toSeq,
      "the restarted maintainer must route with the SAME centroids")
    assert(m2.index().assigned.count() === 52)

    // replayed micro-batch (foreachBatch retry): merging an
    // already-processed batch id is idempotent AND cannot re-trigger
    // the drift gate — the round-7 ADVICE failure mode
    val replay = spark.createDataFrame(
      (200 until 212).map { i =>
        val v = Array(7.0f, 7.0f, 7.0f, 7.0f)
        v(i % 4) += 0.05f * (i - 199); (i.toLong, v)
      }).toDF("vec_id", "embedding")
    val d = m2.processBatch(replay, batchId = 2L)
    assert(!d.retrain && !m2.retrainPending,
      "a replay must not re-enter the drift gate")
    assert(m2.index().assigned.count() === 52, "replay merge is idempotent")
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.Ivf

/** Streaming ANN index maintenance — the continuous counterpart of the
  * batch IVF trainer, composed from pieces that already exist:
  *
  *  - each micro-batch assigns its vectors to the STORED centroids
  *    ([[Ivf.assign]], the same native `NearestCell` expression every
  *    Lloyd round uses) and lands them through the fenced versioned
  *    merge sink keyed by vec_id — so the index table stays queryable
  *    (and replay-idempotent) across batches, readers always see the
  *    last committed snapshot, and a retrain never blocks a reader;
  *  - after each commit, [[Ivf.ingestCensus]]'s drift ratios (q191's
  *    operator) feed a retrain-now decision the way q158's key census
  *    drives `skewAwareJoin`: retrain exactly when some cell absorbs a
  *    meaningful share of the batch AND grows far beyond its stored
  *    mass (or is a previously-empty cell coming alive) — uniform
  *    growth keeps the index representative and costs nothing.
  *
  * The maintainer state is the centroid model (nlist × dim doubles —
  * KBs, the same driver-side model every IVF path broadcasts) plus the
  * fenced table on disk; the stream itself holds NO Spark state, so a
  * restart resumes from (stored table, retrained-or-shipped centroids)
  * with nothing to recover.
  *
  * 100 TB shape: per batch, assignment is one scan of the BATCH (not
  * the corpus) against a broadcast centroid literal; the census is a
  * map-side-combined groupBy of the stored assignment (nlist rows
  * out); only a triggered retrain re-scans the corpus — which is the
  * cost the drift gate exists to amortize.
  */
object AnnIngest {

  /** Drift thresholds, both exact integer micro-ratios against
    * [[Ivf.ingestCensus]]'s output: a cell triggers when
    * `share_new_micro >= shareMicro` (it matters to THIS batch) AND
    * (`growth_micro >= growthMicro` OR the cell had no stored mass at
    * all — infinite growth). */
  final case class Thresholds(growthMicro: Long = 500000L,
                              shareMicro: Long = 250000L)

  /** The decision plus its evidence (model-sized, collected). */
  final case class Drift(retrain: Boolean, triggeredCells: Seq[Long],
                         maxGrowthMicro: Long, maxShareMicro: Long)

  /** Apply the documented rule to a census frame
    * (cell, n_old, n_new, growth_micro, share_new_micro). */
  def retrainDecision(census: DataFrame, t: Thresholds): Drift = {
    val rows = census.select(col("cell"), col("n_new"),
        col("growth_micro"), col("share_new_micro"))
      .collect() // nlist rows — model-sized by construction
    val triggered = rows.filter { r =>
      val share = r.getLong(3)
      val grownEnough =
        r.isNullAt(2) && r.getLong(1) > 0 || // n_old = 0, cell coming alive
          (!r.isNullAt(2) && r.getLong(2) >= t.growthMicro)
      share >= t.shareMicro && grownEnough
    }.map(_.getLong(0)).toSeq
    val growths = rows.collect { case r if !r.isNullAt(2) => r.getLong(2) }
    Drift(triggered.nonEmpty, triggered,
      if (growths.isEmpty) 0L else growths.max,
      if (rows.isEmpty) 0L else rows.map(_.getLong(3)).max)
  }

  /** Driver-side maintainer: owns the centroid model across
    * micro-batches (foreachBatch runs on the driver, so plain fields
    * suffice — no distributed state). Bootstrap: the first batch
    * trains the initial index with [[Ivf.autoNlist]] sizing. */
  final class Maintainer(spark: SparkSession, tablePath: String,
                         thresholds: Thresholds = Thresholds(),
                         trainIters: Int = 3) extends Serializable {
    @volatile private var model: Array[Array[Double]] = _
    @volatile private var retrains: Int = 0
    private var epoch: Long = 0L

    def centroids: Array[Array[Double]] = model
    def retrainCount: Int = retrains

    /** The queryable view: stored vectors + their cells under the
      * CURRENT model, as an [[Ivf.Index]] ready for `Ivf.topK`. The
      * cell column rides the table (written at ingest), so a query
      * never re-assigns the corpus. */
    def index(): Ivf.Index =
      Ivf.Index(model, UpsertSink.ParquetMergeSink.read(spark, tablePath))

    /** One micro-batch: assign against stored centroids, fenced merge,
      * census, drift-gated retrain. Returns the decision for
      * observability (the streaming query ignores it). */
    def processBatch(batch: DataFrame): Drift = {
      epoch += 1
      val batchEpoch = epoch
      if (model == null) {
        // bootstrap: first batch trains the shipped index
        val n = batch.count()
        val idx = Ivf.trainChecked(batch, Ivf.autoNlist(n), trainIters)
        model = idx.centroids
        UpsertSink.ParquetMergeSink.merge(
          idx.assigned.withColumn("ingest_epoch", lit(batchEpoch)),
          tablePath, Seq("vec_id"))
        return Drift(retrain = false, Seq.empty, 0L, 0L)
      }
      UpsertSink.ParquetMergeSink.merge(
        Ivf.assign(batch, model).withColumn("ingest_epoch", lit(batchEpoch)),
        tablePath, Seq("vec_id"))
      val stored = UpsertSink.ParquetMergeSink.read(spark, tablePath)
      val census = Ivf.ingestCensus(Ivf.Index(model, stored),
        isNew = col("ingest_epoch") === batchEpoch)
      val d = retrainDecision(census, thresholds)
      if (d.retrain) {
        val n = stored.count()
        val idx = Ivf.trainChecked(stored, Ivf.autoNlist(n), trainIters)
        model = idx.centroids
        // full re-assignment commits as one new fenced version; readers
        // on the previous version keep the old (still-valid) cells
        UpsertSink.ParquetMergeSink.merge(
          idx.assigned.select(stored.columns.map(col).toIndexedSeq: _*),
          tablePath, Seq("vec_id"))
        retrains += 1
      }
      d
    }

    /** Wire the maintainer under a streaming source of
      * (vec_id, embedding) rows. */
    def start(vectors: DataFrame, checkpointDir: String)
    : org.apache.spark.sql.streaming.StreamingQuery =
      vectors.writeStream
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (b: DataFrame, _: Long) =>
          if (!b.isEmpty) { processBatch(b); () }
        }
        .start()
  }
}

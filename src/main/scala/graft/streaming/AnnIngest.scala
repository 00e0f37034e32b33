package graft.streaming

import java.nio.charset.StandardCharsets
import java.util.concurrent.{Callable, Executors, Future => JFuture}

import org.apache.hadoop.fs.Path
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
  *    operator) feed a retrain decision the way q158's key census
  *    drives `skewAwareJoin`: retrain exactly when some cell absorbs a
  *    meaningful share of the batch AND grows far beyond its stored
  *    mass (or is a previously-empty cell coming alive) — uniform
  *    growth keeps the index representative and costs nothing;
  *  - a triggered retrain is STAGED, never paid by the triggering
  *    batch: Lloyd's iterations run on a driver-side worker thread
  *    against the version-pinned snapshot that tripped the gate
  *    (committed versions are immutable, so the trainer needs no
  *    coordination with later merges), while micro-batches keep
  *    assigning against the old centroids. The new model is adopted
  *    at the next batch boundary after training finishes: one
  *    assignment pass re-routes the WHOLE stored table — including
  *    every vector ingested while the trainer ran, so nothing is lost
  *    across the swap — and commits as one new fenced version. The
  *    hot path's worst case is that single narrow scan, never the
  *    iterative trainer.
  *
  * The maintainer state is the centroid model (nlist × dim doubles —
  * KBs, the same driver-side model every IVF path broadcasts) plus the
  * fenced table on disk. The model, the last processed batch id and
  * the retrain count are persisted as a tiny JSON artifact next to the
  * table (the S8 model-artifact discipline) on every state change, so
  * a restarted driver resumes with the SAME routing the table's cells
  * were assigned under — without it, a restart would re-bootstrap from
  * one batch and silently mix fresh centroids with stale stored cells.
  * Restart contract: resume with the SAME checkpoint dir (streaming
  * batch ids continue past the persisted epoch); pairing the table
  * with a fresh checkpoint restarts batch ids at 0 and requires a
  * fresh table + model path too.
  *
  * Epochs ARE the streaming batch ids: a replayed micro-batch
  * (foreachBatch retry after a failure) re-merges under its ORIGINAL
  * epoch — the keyed merge was already idempotent, and reusing the id
  * keeps the drift census from double-counting the replay as new mass
  * and re-triggering a retrain.
  *
  * 100 TB shape: per batch, assignment is one scan of the BATCH (not
  * the corpus) against a broadcast centroid literal; the census is a
  * map-side-combined groupBy of the stored assignment (nlist rows
  * out); the staged retrain re-scans the corpus off the hot path —
  * which is the cost the drift gate exists to amortize — and the swap
  * pays one more narrow corpus scan at a batch boundary.
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
    * trains the initial index with [[Ivf.autoNlist]] sizing; if the
    * table already holds committed vectors but no model artifact
    * survives (a pre-maintainer table), the bootstrap trains on
    * stored ∪ batch and re-assigns the stored rows too, so routing
    * and cells can never disagree. */
  final class Maintainer(spark: SparkSession, tablePath: String,
                         thresholds: Thresholds = Thresholds(),
                         trainIters: Int = 3) extends Serializable {
    @volatile private var model: Array[Array[Double]] = _
    @volatile private var retrains: Int = 0
    // last COMPLETED streaming batch id (−1 = nothing processed);
    // doubles as the ingest_epoch of that batch's rows
    @volatile private var epoch: Long = -1L

    // the staged retrain: new centroids being trained on a worker
    // thread, adopted at the next batch boundary after completion
    @transient private lazy val trainerPool =
      Executors.newSingleThreadExecutor { r =>
        val t = new Thread(r, "graft-ann-retrain"); t.setDaemon(true); t
      }
    @transient @volatile private var staged: JFuture[Array[Array[Double]]] = _

    loadState()

    def centroids: Array[Array[Double]] = model
    def retrainCount: Int = retrains

    /** True while a staged retrain is training (observability; the
      * new model is adopted at the next batch boundary after it
      * finishes). */
    def retrainPending: Boolean = staged != null

    /** The queryable view: stored vectors + their cells under the
      * CURRENT model, as an [[Ivf.Index]] ready for `Ivf.topK`. The
      * cell column rides the table (written at ingest), so a query
      * never re-assigns the corpus. */
    def index(): Ivf.Index =
      Ivf.Index(model, UpsertSink.ParquetMergeSink.read(spark, tablePath))

    /** One micro-batch: adopt a finished staged retrain, assign
      * against the current centroids, fenced merge, census, and stage
      * a retrain when drift triggers. Returns the decision for
      * observability (the streaming query ignores it). `batchId` is
      * the streaming batch id; a replay (batchId <= last completed
      * epoch) re-merges idempotently under its original epoch and
      * skips the drift gate. */
    def processBatch(batch: DataFrame, batchId: Long): Drift = {
      adoptFinishedRetrain()
      if (model == null) return bootstrap(batch, batchId)
      if (batchId <= epoch) {
        // replayed micro-batch: the keyed merge is idempotent, and the
        // ORIGINAL epoch rides the rows so the census can't re-count
        // them as new; the gate already ran when the batch first
        // completed
        UpsertSink.ParquetMergeSink.merge(
          Ivf.assign(batch, model).withColumn("ingest_epoch", lit(batchId)),
          tablePath, Seq("vec_id"))
        return Drift(retrain = false, Seq.empty, 0L, 0L)
      }
      UpsertSink.ParquetMergeSink.merge(
        Ivf.assign(batch, model).withColumn("ingest_epoch", lit(batchId)),
        tablePath, Seq("vec_id"))
      // the epoch commits BEFORE the drift gate: a crash between here
      // and the gate makes the replayed batch take the idempotent
      // replay path above instead of re-counting its rows as fresh
      // drift mass and staging a spurious retrain. The trade is the
      // mirror image — a retrain this gate WOULD have staged is lost
      // on such a crash — which is benign for correctness (routing
      // stays consistent; persistent drift re-fires on later batches).
      epoch = batchId
      saveState()
      // version-pinned snapshot: read() resolves the committed version
      // directory eagerly, so the frame is immutable from here on —
      // safe to hand to the trainer thread while later batches commit
      // new versions
      val stored = UpsertSink.ParquetMergeSink.read(spark, tablePath)
      val census = Ivf.ingestCensus(Ivf.Index(model, stored),
        isNew = col("ingest_epoch") === batchId)
      val d = retrainDecision(census, thresholds)
      if (d.retrain && staged == null) {
        // stage, don't pay: Lloyd's runs off the hot path; this batch
        // returns as soon as the census is done
        staged = trainerPool.submit(new Callable[Array[Array[Double]]] {
          def call(): Array[Array[Double]] = {
            val n = stored.count()
            Ivf.trainChecked(stored, Ivf.autoNlist(n), trainIters).centroids
          }
        })
      }
      d
    }

    /** Non-streaming convenience: processes with the next epoch. */
    def processBatch(batch: DataFrame): Drift =
      processBatch(batch, epoch + 1)

    /** First-ever batch (or first after losing the model artifact):
      * train on stored ∪ batch, re-assign any stored rows under the
      * fresh centroids (their original ingest epochs survive), merge
      * the batch at this epoch. */
    private def bootstrap(batch: DataFrame, batchId: Long): Drift = {
      val storedOpt =
        try Some(UpsertSink.ParquetMergeSink.read(spark, tablePath))
        catch { case _: java.io.FileNotFoundException => None }
      val trainSet = storedOpt match {
        case Some(st) => st.select(col("vec_id"), col("embedding"))
          .unionByName(batch.select(col("vec_id"), col("embedding")))
        case None => batch
      }
      val n = trainSet.count()
      val idx = Ivf.trainChecked(trainSet, Ivf.autoNlist(n), trainIters)
      model = idx.centroids
      val batchAssigned = Ivf.assign(batch, model)
        .withColumn("ingest_epoch", lit(batchId))
      val toMerge = storedOpt match {
        case Some(st) =>
          val cols = st.columns.map(col).toIndexedSeq
          Ivf.assign(st, model).select(cols: _*)
            .unionByName(batchAssigned.select(cols: _*))
        case None => batchAssigned
      }
      // ingest_epoch as the merge order: on a key collision the
      // batch's row (highest epoch) wins deterministically
      UpsertSink.ParquetMergeSink.merge(toMerge, tablePath, Seq("vec_id"),
        orderCol = Some("ingest_epoch"))
      epoch = batchId
      saveState()
      Drift(retrain = false, Seq.empty, 0L, 0L)
    }

    /** Adopt a finished staged retrain at a batch boundary: swap the
      * centroids and re-assign the WHOLE current table under them in
      * one narrow scan — vectors ingested while the trainer ran are
      * re-routed too, so the swap loses nothing. A trainer failure
      * surfaces here (fails the streaming query loudly rather than
      * silently keeping a stale index). */
    private def adoptFinishedRetrain(): Unit = {
      val s = staged
      if (s != null && s.isDone) {
        staged = null
        val fresh = s.get()
        val stored = UpsertSink.ParquetMergeSink.read(spark, tablePath)
        model = fresh
        UpsertSink.ParquetMergeSink.merge(
          Ivf.assign(stored, fresh)
            .select(stored.columns.map(col).toIndexedSeq: _*),
          tablePath, Seq("vec_id"))
        retrains += 1
        saveState()
      }
    }

    /** Block until a staged retrain (if any) has trained AND been
      * adopted — test/ops hook; production just keeps feeding batches
      * and the adoption happens at the next boundary. */
    def awaitRetrainQuiesced(): Unit = {
      val s = staged
      if (s != null) { s.get(); adoptFinishedRetrain() }
    }

    // ----------------------------------------------------------------
    // persisted state: {"epoch":…,"retrains":…,"centroids":[[…],…]}
    // written atomically next to the table via the table's FileSystem
    // (local or HDFS alike). Doubles round-trip exactly through
    // toString/toDouble.
    private def modelArtifactPath = new Path(tablePath + ".model.json")

    private def fs = modelArtifactPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def saveState(): Unit = {
      val json =
        s"""{"epoch": $epoch, "retrains": $retrains,
           | "centroids": [${model.map(c => "[" + c.mkString(", ") + "]")
          .mkString(", ")}]}""".stripMargin
      val tmp = new Path(tablePath + ".model.json.tmp")
      val out = fs.create(tmp, true)
      try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
      // rename WITH overwrite (FileContext API — FileSystem.rename has
      // none): delete-then-rename left a crash window with no artifact
      // at all, after which a restart silently took the bootstrap path
      // and retrained fresh centroids instead of resuming the
      // persisted routing. This commit is atomic on local and HDFS.
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        modelArtifactPath.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, modelArtifactPath,
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }

    private def loadState(): Unit = {
      if (!fs.exists(modelArtifactPath)) return
      val in = fs.open(modelArtifactPath)
      val json =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          new String(buf.toByteArray, StandardCharsets.UTF_8)
        } finally in.close()
      def longOf(key: String): Long = {
        val i = json.indexOf("\"" + key + "\"")
        json.substring(json.indexOf(':', i) + 1)
          .takeWhile(c => c != ',' && c != '}').trim.toLong
      }
      epoch = longOf("epoch")
      retrains = longOf("retrains").toInt
      val ci = json.indexOf("\"centroids\"")
      val s = json.indexOf('[', ci)
      val e = json.lastIndexOf(']')
      val body = json.substring(s + 1, e).trim
      model =
        if (body.isEmpty) Array.empty
        else body.stripPrefix("[").stripSuffix("]")
          .split("\\]\\s*,\\s*\\[")
          .map(_.split(",").map(_.trim.toDouble))
    }

    /** Wire the maintainer under a streaming source of
      * (vec_id, embedding) rows. The foreachBatch batch id IS the
      * ingest epoch (replays reuse it — see the class doc). */
    def start(vectors: DataFrame, checkpointDir: String)
    : org.apache.spark.sql.streaming.StreamingQuery =
      vectors.writeStream
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (b: DataFrame, id: Long) =>
          if (!b.isEmpty) { processBatch(b, id); () }
        }
        .start()
  }
}

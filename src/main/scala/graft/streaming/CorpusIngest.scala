package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.pipeline.CorpusPipeline
import graft.text.TextAnalysis

/** Streaming corpus ingest — the continuous counterpart of
  * [[graft.pipeline.CorpusPipeline]]: documents arrive on a JSON wire,
  * and each micro-batch is (1) schema-parsed with corrupt-record skip,
  * (2) deduplicated against wire replays within the event-time
  * watermark, (3) quality-gated with the SAME thresholds as the batch
  * pipeline, (4) exact-deduplicated against the ALREADY-STORED corpus
  * by fingerprint (stream-static anti join — the q156/q173/q180
  * incremental-ingest discipline at the document level), and (5)
  * committed through the fenced versioned merge sink, so replayed
  * micro-batches are absorbed idempotently by the doc key.
  *
  * 100 TB shape: every stage is per-row or keyed state —
  * `dropDuplicatesWithinWatermark` holds state bounded by the
  * duplicate horizon (not stream lifetime); the corpus-fingerprint
  * side is a static frame the planner may broadcast (at real scale:
  * a Bloom prefilter — [[graft.dedup.BloomLineDedup]]'s sketch — in
  * front of an exact confirm join against the bucketed store); the
  * sink writes one fenced commit per micro-batch. No stage buffers
  * the stream.
  */
object CorpusIngest {

  /** Document wire schema: flat JSON, one message per document. */
  val wireSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType),
    StructField("event_ts", TimestampType)))

  /** Parse the one-string-column wire; corrupt or key-less records
    * yield a null struct and are skipped (the reference consumer's
    * per-record try/except). */
  def parseWire(df: DataFrame, value: Column): DataFrame =
    df.select(from_json(value, wireSchema).as("r"))
      .filter(col("r").isNotNull && col("r.doc_id").isNotNull &&
        col("r.text").isNotNull)
      .select(col("r.*"))

  /** The batch pipeline's quality gate, verbatim thresholds (one
    * config object so stream and batch can never drift). */
  def qualityGate(df: DataFrame, text: Column,
                  cfg: CorpusPipeline.Config = CorpusPipeline.Config()): DataFrame =
    TextAnalysis.qualityFeatures(df, text)
      .filter(col("n_tokens") >= cfg.minTokens &&
        col("n_tokens") <= cfg.maxTokens &&
        col("avg_token_len") >= cfg.minAvgTokenLen &&
        col("avg_token_len") <= cfg.maxAvgTokenLen &&
        col("stopword_ratio") >= cfg.minStopwordRatio &&
        col("punct_ratio") <= cfg.maxPunctRatio)
      .drop("n_chars", "avg_token_len", "stopword_ratio", "punct_ratio",
        "__toks")

  /** Wire → clean new-document stream. `corpusFingerprints` is the
    * static frame of md5 text fingerprints already in the store
    * (column `fp`); stream rows whose fingerprint is known are dropped
    * by a stream-static left-anti join before they cost anything
    * downstream. */
  def transforms(parsed: DataFrame, corpusFingerprints: DataFrame,
                 watermarkDelay: String = "10 minutes",
                 cfg: CorpusPipeline.Config = CorpusPipeline.Config()): DataFrame = {
    val deduped = parsed
      .withWatermark("event_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("doc_id")
    qualityGate(deduped, col("text"), cfg)
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .join(corpusFingerprints.select(col("fp")), Seq("fp"), "left_anti")
  }

  /** Run the full ingest: FileKafka wire → transforms → fenced
    * versioned merge (keyed by doc_id, so micro-batch replays are
    * idempotent). Swap `FileKafka.readStream` for `format("kafka")`
    * and the merge sink for Delta/Iceberg MERGE in production —
    * README "Deployment notes". */
  /** Batch-vs-corpus LSH plan re-pricer — the near-dup sibling of the
    * ANN maintainer's `Ivf.ingestCensus` gate: after a micro-batch
    * lands, price the banding grid on the BATCH's own sampled
    * pair-similarity distribution next to the corpus's, in one frame
    * ([[graft.dedup.Dedup.lshPlanDrift]]). `plan_changed` = the
    * shipped operating point (q212's choice, calibrated on the corpus)
    * is no longer cost-minimal for what's arriving — e.g. a re-crawl
    * flooding near-duplicates moves the optimum toward more bands.
    * Cost: two 48-doc samples + a 7-row join — cheap enough to run per
    * batch, like the drift census it mirrors. [[BandPlanMaintainer]]
    * consumes the flag and performs the actual staged re-banding. */
  def bandPlanDrift(corpusDocs: DataFrame, batch: DataFrame,
                    threshold: Double = 0.5): DataFrame =
    graft.dedup.Dedup.lshPlanDrift(corpusDocs, batch, col("doc_id"),
      TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3), threshold)

  /** Drift-adaptive banding maintainer — wires [[bandPlanDrift]]'s
    * `plan_changed` flag to an ACTUAL operating-point swap, with the
    * fencing discipline of [[AnnIngest.Maintainer]] (staged adoption at
    * the batch boundary, epoch-first persistence, rename-with-overwrite
    * state commits):
    *
    *  - each micro-batch finds near-dup candidates of the batch
    *    against the stored corpus under the CURRENT (bands, rows)
    *    point and merges them into the keyed candidate store, then
    *    merges the batch's docs into the corpus store — both merges
    *    keyed, so a replay can never duplicate (it re-derives
    *    candidates under the CURRENT plan, which after a swap may ADD
    *    pairs the original pass missed — the at-least-once side of the
    *    contract; it never drops any);
    *  - the epoch persists immediately after the merges and BEFORE the
    *    re-pricer, so a crash in between replays idempotently instead
    *    of re-staging (the AnnIngest round-9 ordering);
    *  - [[graft.dedup.Dedup.lshPlanDrift]] then re-prices per batch
    *    (two 48-doc samples — cheaper than one banding round); when
    *    `plan_changed`, the cheapest batch-chosen split (fewest bands,
    *    the planner's own tie rule) is STAGED and adopted at the NEXT
    *    batch boundary. The flagging batch itself completed under the
    *    plan it was priced against, so a swap can never lose a
    *    candidate mid-batch, and candidates discovered under earlier
    *    plans stay in the store — the swap only changes how FUTURE
    *    batches band. Each candidate row carries `bands_at_discovery`
    *    so post-hoc recall audits know which operating point found it.
    *
    * Driver-side state like the ANN maintainer (foreachBatch runs on
    * the driver); restarts resume from `<corpusPath>.bandplan.json`. */
  final class BandPlanMaintainer(spark: SparkSession, corpusPath: String,
                                 candPath: String, threshold: Double = 0.5,
                                 initialBands: Int = 16,
                                 shingleSize: Int = 3, seed: Long = 42L)
      extends Serializable {
    require(Seq(1, 2, 4, 8, 16, 32, 64).contains(initialBands),
      s"bands must divide the 64-hash signature, got $initialBands")

    @volatile private var bands: Int = initialBands
    @volatile private var stagedBands: Int = 0 // 0 = nothing staged
    @volatile private var epoch: Long = -1L
    @volatile private var swapCount: Int = 0

    loadState()

    def currentBands: Int = bands
    def rowsPerBand: Int = 64 / bands
    def stagedPlan: Option[Int] = if (stagedBands > 0) Some(stagedBands) else None
    def swaps: Int = swapCount

    /** One micro-batch of (doc_id, text): adopt any staged plan, band
      * the batch against the stored corpus under the CURRENT plan,
      * merge candidates + docs, persist the epoch, THEN re-price.
      * Returns `plan_changed` (false on bootstrap and replays). */
    def processBatch(batch: DataFrame, batchId: Long): Boolean = {
      adoptStagedPlan()
      // version-pinned PRE-batch corpus: candidates and the re-pricer
      // both see the corpus as it stood before this batch landed
      val storedOpt =
        try Some(UpsertSink.ParquetMergeSink.read(spark, corpusPath))
        catch { case _: java.io.FileNotFoundException => None }
      val replay = batchId <= epoch
      storedOpt.foreach { stored =>
        val cand = graft.dedup.Dedup.minhashCandidatesAgainst(
          batch, stored, col("doc_id"), col("text"),
          numHashes = 64, shingleSize = shingleSize, bands = bands,
          seed = seed)
          // a replayed batch's docs are already in the corpus — drop
          // the self-collisions that creates
          .filter(col("new_id") =!= col("corpus_id"))
          .withColumn("bands_at_discovery", lit(bands.toLong))
          .withColumn("ingest_epoch", lit(if (replay) epoch else batchId))
        UpsertSink.ParquetMergeSink.merge(cand, candPath,
          keyCols = Seq("new_id", "corpus_id"))
      }
      UpsertSink.ParquetMergeSink.merge(
        batch.select(col("doc_id"), col("text")), corpusPath, Seq("doc_id"))
      if (replay) return false
      epoch = batchId
      saveState()
      val changed = storedOpt.exists { stored =>
        val drift = bandPlanDrift(stored, batch, threshold)
          .select("bands", "batch_chosen", "plan_changed").collect()
        val flipped = drift.headOption.exists(_.getAs[Boolean]("plan_changed"))
        if (flipped && stagedBands == 0) {
          val nb = drift.filter(_.getAs[Boolean]("batch_chosen"))
            .map(_.getAs[Long]("bands").toInt).min
          if (nb != bands) { stagedBands = nb; saveState() }
        }
        flipped
      }
      changed
    }

    private def adoptStagedPlan(): Unit =
      if (stagedBands > 0) {
        bands = stagedBands
        stagedBands = 0
        swapCount += 1
        saveState()
      }

    // persisted state, committed like the ANN model artifact
    private def statePath =
      new org.apache.hadoop.fs.Path(corpusPath + ".bandplan.json")

    private def fs = statePath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def saveState(): Unit = {
      val json = s"""{"epoch": $epoch, "bands": $bands,""" +
        s""" "staged_bands": $stagedBands, "swaps": $swapCount}"""
      val tmp = new org.apache.hadoop.fs.Path(corpusPath + ".bandplan.json.tmp")
      val out = fs.create(tmp, true)
      try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        statePath.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, statePath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }

    private def loadState(): Unit = {
      if (!fs.exists(statePath)) return
      val in = fs.open(statePath)
      val json = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
      def longOf(key: String): Long = {
        val i = json.indexOf("\"" + key + "\"")
        json.substring(json.indexOf(':', i) + 1)
          .takeWhile(c => c != ',' && c != '}').trim.toLong
      }
      epoch = longOf("epoch")
      bands = longOf("bands").toInt
      stagedBands = longOf("staged_bands").toInt
      swapCount = longOf("swaps").toInt
    }
  }

  def start(spark: SparkSession, wireDir: String, corpusFingerprints: DataFrame,
            tablePath: String, checkpointDir: String,
            watermarkDelay: String = "10 minutes"): StreamingQuery = {
    val raw = graft.kafka.FileKafka.readStream(spark, wireDir)
    // the wire value is BinaryType (Kafka's exact column shape)
    val cleaned = transforms(parseWire(raw, col("value").cast("string")),
      corpusFingerprints, watermarkDelay)
    cleaned.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        UpsertSink.ParquetMergeSink.merge(batch, tablePath,
          keyCols = Seq("doc_id"))
      }
      .start()
  }

  /** The MAINTAINED ingest topology — [[start]]'s plain merge sink
    * replaced by [[BandPlanMaintainer.processBatch]] driven with the
    * REAL streaming batch id, so the maintainer's epoch fencing rides
    * the engine's own replay semantics: a restarted query re-delivers
    * a micro-batch under its original id, the maintainer sees
    * `batchId <= epoch` and takes the idempotent replay path, and a
    * staged band-plan swap lands exactly at a batch boundary — the
    * whole lifecycle (flood → flip → staged → adopted) now executes
    * through `writeStream.start()`, not a hand-driven loop
    * (CorpusIngestSpec pins it end to end; the hand-driven
    * Round9OpsSpec test keeps the invariant-level pins). The
    * corpus-fingerprint anti-join of [[transforms]] is subsumed by
    * the maintainer's keyed merges. */
  def startWithMaintenance(spark: SparkSession, wireDir: String,
                           maintainer: BandPlanMaintainer,
                           checkpointDir: String,
                           watermarkDelay: String = "10 minutes",
                           cfg: CorpusPipeline.Config = CorpusPipeline.Config())
  : StreamingQuery = {
    val raw = graft.kafka.FileKafka.readStream(spark, wireDir)
    val parsed = parseWire(raw, col("value").cast("string"))
      .withWatermark("event_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("doc_id")
    qualityGate(parsed, col("text"), cfg)
      .select(col("doc_id"), col("text"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) { maintainer.processBatch(batch, batchId); () }
      }
      .start()
  }
}

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
    * batch, like the drift census it mirrors. The maintainer alerts or
    * re-bands on the flag; this library computes the evidence. */
  def bandPlanDrift(corpusDocs: DataFrame, batch: DataFrame,
                    threshold: Double = 0.5): DataFrame =
    graft.dedup.Dedup.lshPlanDrift(corpusDocs, batch, col("doc_id"),
      TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3), threshold)

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
}

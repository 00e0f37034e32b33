package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.expressions.HashExpressions

/** Streaming MinHash-LSH near-duplicate detection — the fuzzy
  * counterpart of [[StreamDedup]]'s exact-key dedup: two documents
  * arriving within a time horizon of each other that share any LSH
  * band key are emitted as a candidate pair, continuously.
  *
  * Shape: per incoming doc, ONE stateless projection computes the
  * MinHash signature and explodes it into (band, bandHash) keys (the
  * exact constants of the batch path — [[Dedup.minhashCandidates]] —
  * so stream and batch agree on what "near-dup" means); then a
  * watermarked stream-stream SELF-join on the band key with a
  * two-sided event-time bound. The time bound is what makes this
  * viable unbounded: each side's per-key state is evicted once the
  * watermark passes `ts + horizon`, so state tracks the duplicate
  * horizon × band-key cardinality, never stream lifetime.
  *
  * Output is band-level collision events (a pair sharing k bands
  * appears k times, each tagged with its band): deduplicating pairs
  * would chain a second stateful operator after the join, and the
  * downstream consumer (quarantine queue, upsert sink) is keyed and
  * idempotent anyway — the same at-least-once contract every other
  * wire stage here carries.
  *
  * 100 TB/continuous shape: the only shuffle is the band-key hash
  * partition (tiny (int, long) keys); signatures never re-shuffle per
  * band; RocksDB state per band key bounded by the horizon. The
  * verify step (exact Jaccard on candidate pairs) joins text back by
  * id downstream, exactly like the batch pipeline.
  */
object StreamNearDup {

  /** Candidate near-dup pairs from a STREAMING docs frame.
    *
    * @param docs     streaming DataFrame with `idCol`, `tsCol`, `textCol`
    * @param delay    watermark delay, e.g. "2 minutes"
    * @param horizon  pairing window, e.g. "10 minutes": docs pair iff
    *                 |ts_a − ts_b| ≤ horizon and they share a band key
    */
  def candidatePairs(docs: DataFrame, idCol: String, tsCol: String,
                     textCol: String, delay: String, horizon: String,
                     numHashes: Int = 64, bands: Int = 16,
                     shingleSize: Int = 3, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val (as, bs) = Dedup.mixConstants(numHashes, seed).unzip
    val keyed = docs
      .select(col(idCol).as("id"), col(tsCol).as("ts"),
        Dedup.shingleHashes32(col(textCol), shingleSize).as("__h32"))
      .select(col("id"), col("ts"), HashExpressions
        .minhash_signature(col("__h32"), as.toArray, bs.toArray).as("sig"))
      .select(col("id"), col("ts"),
        explode(Dedup.lshBandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("id"), col("ts"),
        col("bk.band").as("band"), col("bk.bh").as("bh"))
    val a = keyed.select(col("id").as("a_id"), col("ts").as("a_ts"),
      col("band").as("a_band"), col("bh").as("a_bh"))
      .withWatermark("a_ts", delay)
    val b = keyed.select(col("id").as("b_id"), col("ts").as("b_ts"),
      col("band").as("b_band"), col("bh").as("b_bh"))
      .withWatermark("b_ts", delay)
    // StreamingJoinHelper derives the state-eviction watermark
    // per-conjunct: it extracts bounds from the two time predicates
    // and merely WARNs on the (non-time) id-ordering conjunct, which
    // Catalyst pushes into the join condition regardless of where it
    // is written. The spec pins numRowsRemoved > 0, so a Spark-side
    // regression of that extraction would fail loudly here.
    a.join(b, expr(
      s"""a_band = b_band AND a_bh = b_bh
         |AND b_ts BETWEEN a_ts - interval $horizon
         |           AND a_ts + interval $horizon""".stripMargin))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"),
        col("a_band").as("band"), col("a_ts").as("ts_a"),
        col("b_ts").as("ts_b"))
  }
}

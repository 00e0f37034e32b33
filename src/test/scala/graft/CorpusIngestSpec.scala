package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.kafka.FileKafka
import graft.streaming.{CorpusIngest, UpsertSink}

/** End-to-end streaming corpus ingest: JSON wire → corrupt-skip →
  * watermark dedup → batch-identical quality gate → stream-static
  * fingerprint anti-join vs the stored corpus → fenced versioned merge.
  */
class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private val goodBase = "the quick brown fox jumps over the lazy dog again"
  private def goodText(tag: String): String =
    (1 to 4).map(_ => goodBase).mkString(" ") + " " + tag // 41 tokens, has stopwords

  private def msg(id: Long, text: String): String = {
    val esc = text.replace("\"", "\\\"")
    s"""{"doc_id":$id,"source":"s1","text":"$esc","event_ts":"2024-01-01T00:0${id % 10}:00Z"}"""
  }

  test("wire to versioned store: corrupt/replay/known/low-quality all filtered") {
    val topic = Files.createTempDirectory("graft_ci").resolve("docs").toString
    val table = Files.createTempDirectory("graft_ci_tbl").toString + "/corpus"
    val ckpt = Files.createTempDirectory("graft_ci_ck").toString

    val storedText = goodText("stored")
    val corpusFps = Seq(storedText).toDF("text")
      .select(graft.text.TextAnalysis.fingerprint(col("text")).as("fp"))

    FileKafka.produce(Seq(
      msg(1, goodText("fresh")), // new: lands
      msg(1, goodText("fresh")), // wire replay: absorbed by watermark dedup
      msg(2, storedText), // already in the corpus: anti-joined away
      msg(3, "x y z"), // fails the quality gate
      "corrupt {not json", // parse skip
      msg(4, goodText("also-fresh")) // new: lands
    ).toDF("value"), topic)

    val q = CorpusIngest.start(spark, topic, corpusFps, table, ckpt)
    try q.processAllAvailable() finally q.stop()

    val stored = UpsertSink.ParquetMergeSink.read(spark, table)
    val ids = stored.select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(1L, 4L))

    // a replayed producer (at-least-once wire) must not duplicate rows:
    // the merge key absorbs the re-delivery in a NEW stream instance
    FileKafka.produce(Seq(msg(1, goodText("fresh"))).toDF("value"), topic)
    val q2 = CorpusIngest.start(spark, topic, corpusFps, table,
      Files.createTempDirectory("graft_ci_ck2").toString)
    try q2.processAllAvailable() finally q2.stop()
    val after = UpsertSink.ParquetMergeSink.read(spark, table)
    assert(after.groupBy("doc_id").count()
      .filter(col("count") > 1).count() === 0)
    assert(after.select("doc_id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 4L))
  }

  test("maintained ingest through writeStream: flood flips, stages, adopts") {
    // the Round9OpsSpec band-plan lifecycle, now driven END TO END by a
    // real StreamingQuery: FileKafka wire → parse → quality gate →
    // foreachBatch(maintainer.processBatch) with the engine's own
    // batch ids — flip, staging and adoption all happen at genuine
    // micro-batch boundaries
    val dir = Files.createTempDirectory("graft_bp_stream").toString
    val topic = s"$dir/docs"
    val m = new CorpusIngest.BandPlanMaintainer(spark, s"$dir/corpus",
      s"$dir/cand", initialBands = 4)

    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // only gate-passing docs reach the maintainer — pick the flood
    // seeds from those so the banding sees the full 16×3 structure
    val passing = CorpusIngest.qualityGate(real, col("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(passing.size >= 16, s"need 16 gate-passing docs, got ${passing.size}")
    val seedIds = passing.toSeq.sorted.take(16)
    val basePass = real.filter(col("doc_id").isin(passing.toSeq: _*))
    val seed = real.filter(col("doc_id").isin(seedIds: _*))

    def produce(df: org.apache.spark.sql.DataFrame): Unit =
      FileKafka.produce(df.select(to_json(struct(
        col("doc_id"), lit("s1").as("source"), col("text"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("event_ts")))
        .as("value")), topic)

    val q = CorpusIngest.startWithMaintenance(spark, topic, m,
      s"$dir/ckpt")
    try {
      // batch 0: bootstrap — corpus lands, nothing to price against
      produce(basePass)
      q.processAllAvailable()
      assert(m.currentBands === 4 && m.stagedPlan.isEmpty)

      // batch 1: near-dup flood (16 seeds × 2 variants) — must flip;
      // the flagging batch completes under the OLD plan
      val flood = seed
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(col("text"), lit(" driftvariantx")).as("text"))
        .unionByName(seed.select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" driftvarianty")).as("text")))
      produce(flood)
      q.processAllAvailable()
      assert(m.currentBands === 4, "flagging batch completes under the old plan")
      val stagedTo = m.stagedPlan
      assert(stagedTo.nonEmpty && stagedTo.get > 4,
        "a near-dup flood must stage more bands through the stream")

      // batch 2: adoption at this engine batch boundary
      produce(seed.select((col("doc_id") + 300000L).as("doc_id"),
        concat(col("text"), lit(" driftvariantz")).as("text")))
      q.processAllAvailable()
      assert(m.currentBands === stagedTo.get && m.swaps === 1,
        "the staged plan must be adopted at the next micro-batch")
      val cand = UpsertSink.ParquetMergeSink.read(spark, s"$dir/cand")
      assert(cand.count() > 0, "flood variants must band-collide with bases")
      assert(cand.filter(col("new_id") >= 300000L)
        .select("bands_at_discovery").distinct()
        .as[Long].collect().forall(_ === stagedTo.get.toLong),
        "post-swap discoveries carry the new operating point")
    } finally q.stop()
  }

  test("qualityGate thresholds are the batch pipeline's, verbatim") {
    val cfg = graft.pipeline.CorpusPipeline.Config()
    val df = Seq((1L, goodText("a")), (2L, "x y z")).toDF("doc_id", "text")
    val gated = CorpusIngest.qualityGate(df, col("text"), cfg)
    assert(gated.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    // the gate keeps the token count the sink stores
    assert(gated.columns.contains("n_tokens"))
  }
}

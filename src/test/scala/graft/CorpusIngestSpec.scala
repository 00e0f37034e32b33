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

  test("qualityGate thresholds are the batch pipeline's, verbatim") {
    val cfg = graft.pipeline.CorpusPipeline.Config()
    val df = Seq((1L, goodText("a")), (2L, "x y z")).toDF("doc_id", "text")
    val gated = CorpusIngest.qualityGate(df, col("text"), cfg)
    assert(gated.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    // the gate keeps the token count the sink stores
    assert(gated.columns.contains("n_tokens"))
  }
}

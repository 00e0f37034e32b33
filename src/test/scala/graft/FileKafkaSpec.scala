package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.{Clean, Normalize}
import graft.kafka.FileKafka
import graft.ml.Ols
import graft.streaming.{ScoringPipeline, UpsertSink}

/** The Kafka-shaped transport executed end-to-end (r2 verdict "What's
  * missing" #1): same schema, same earliest-offset micro-batch
  * semantics as `format("kafka")`, backed by append-only log files —
  * so S3 (wire sink), S4 (wire source), T1-T4 (delivery + batching +
  * exactly-once) run through a REAL pluggable connector instead of
  * MemoryStream shortcuts.
  */
class FileKafkaSpec extends SparkSpec {
  import spark.implicits._

  private def newTopic(): String = {
    val d = Files.createTempDirectory("graft_fk")
    d.resolve("events").toString
  }

  test("produce → batch read: kafka schema, dense per-partition offsets, byte-safe values") {
    val topic = newTopic()
    val df = (0 until 100).map(i => s"""{"i":$i}""").toDF("value")
    FileKafka.produce(df.repartition(4), topic, numPartitions = 2)
    val got = spark.read.format("filekafka").option("path", topic).load()
    assert(got.schema === FileKafka.schema)
    val offs = got.groupBy("partition")
      .agg(min("offset").as("mn"), max("offset").as("mx"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(offs.map(_._1).toSet === Set(0, 1))
    offs.foreach { case (_, mn, mx, n) =>
      assert(mn === 0L && mx === n - 1) // Kafka's dense per-partition offsets
    }
    assert(offs.map(_._4).sum === 100L)
    val vals = got.select(col("value").cast("string")).as[String].collect().toSet
    assert(vals === (0 until 100).map(i => s"""{"i":$i}""").toSet)
  }

  test("produce with a string key column: keyed records round-trip (ACCEPT_ANY_SCHEMA)") {
    // ACCEPT_ANY_SCHEMA invites string OR binary for key and value —
    // the writer must handle both, like the real Kafka sink's cast.
    val topic = newTopic()
    val keyed = Seq(("FR", "a"), ("DE", "b"), ("FR", "c"))
      .toDF("key", "value")
    FileKafka.produce(keyed, topic)
    val got = spark.read.format("filekafka").option("path", topic).load()
      .select(col("key").cast("string").as("k"), col("value").cast("string").as("v"))
      .as[(String, String)].collect().toSet
    assert(got === Set(("FR", "a"), ("DE", "b"), ("FR", "c")))
    // null keys stay null through the wire (empty marker, not "")
    val topic2 = newTopic()
    FileKafka.produce(
      Seq((null: String, "x"), ("k1", "y")).toDF("key", "value"), topic2)
    val keys = spark.read.format("filekafka").option("path", topic2).load()
      .select(col("key").cast("string")).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0)).toSet
    assert(keys === Set(null, "k1"))
  }

  test("streaming consume: earliest start, then only the new tail per micro-batch") {
    val topic = newTopic()
    FileKafka.produce(Seq("a", "b", "c").toDF("value"), topic)
    val q = FileKafka.readStream(spark, topic)
      .select(col("partition"), col("offset"), col("value").cast("string").as("v"))
      .writeStream.format("memory").queryName("fk_tail").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("fk_tail").count() === 3) // earliest: history replayed
      FileKafka.produce(Seq("d", "e").toDF("value"), topic)
      q.processAllAvailable()
      val rows = spark.table("fk_tail")
        .collect().map(r => (r.getLong(1), r.getString(2))).sortBy(_._1)
      // exactly once per record: offsets 0..4, no re-reads of the prefix
      assert(rows.map(_._2).toSeq === Seq("a", "b", "c", "d", "e"))
      assert(rows.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS fk_tail")
    }
  }

  test("two independent consumers over one topic (consumer-group semantics): upsert + running stats") {
    // the reference consumer feeds TWO sinks: the keyed warehouse
    // upsert and the per-country running stats (consumer.py:217,249).
    // Here each runs as its own streaming query with its own checkpoint
    // — Kafka consumer-group semantics: independent offsets over the
    // same log, neither consumer perturbs the other.
    val unified = Clean.dropNulls(
      Normalize.loadUnified(spark, TestSpark.refData), Normalize.Canonical)
    val flagged = Ols.withSplitFlags(unified, Seq("Country", "Year"))
      .withColumn("y_true", col("Happiness Score"))
    val model = Ols.fit(flagged.filter(col("is_train") === 1),
      Normalize.Features, Normalize.Target)

    val topic = newTopic()
    val dir = Files.createTempDirectory("graft_fk_dual")
    val table = s"$dir/predictions"
    FileKafka.produce(ScoringPipeline.toWire(flagged), topic, numPartitions = 2)

    import graft.streaming.Welford
    val qA = FileKafka.readStream(spark, topic)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        ScoringPipeline.processBatch(model, table)(
          batch.withColumn("value", col("value").cast("string")), id)
      }
      .option("checkpointLocation", s"$dir/ckptA")
      .start()
    val statsIn = ScoringPipeline.score(
        ScoringPipeline.parseWire(
          FileKafka.readStream(spark, topic), col("value").cast("string")), model)
      .select(col("Country").as("key"), col("y_true").as("y"),
        col("y_pred").as("yPred"))
      .as[Welford.In]
    val qB = graft.streaming.CountryStatsStream.runningStats(statsIn)
      .writeStream.format("memory").queryName("fk_stats").outputMode("update")
      .option("checkpointLocation", s"$dir/ckptB")
      .start()
    try {
      qA.processAllAvailable()
      qB.processAllAvailable()
      assert(UpsertSink.ParquetMergeSink.read(spark, table).count() === 781)
      val gotN = spark.table("fk_stats")
        .groupBy("key").agg(max("n").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expectedN = flagged.groupBy("Country").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(gotN === expectedN) // every record reached the stats consumer once
    } finally {
      qA.stop(); qB.stop()
      spark.sql("DROP TABLE IF EXISTS fk_stats")
    }
  }

  test("reference topology through the connector: wire → topic → score → upsert, replay-safe") {
    // producer.py: rows → JSON wire → topic; consumer.py: earliest
    // consume → score → keyed upsert. Duplicate delivery (the replay
    // produce below) must be absorbed by the idempotent sink — the full
    // T4 exactly-once story over an actual source, including a corrupt
    // record skipped in-flight (T7, consumer.py:223-226).
    val unified = Clean.dropNulls(
      Normalize.loadUnified(spark, TestSpark.refData), Normalize.Canonical)
    val flagged = Ols.withSplitFlags(unified, Seq("Country", "Year"))
      .withColumn("y_true", col("Happiness Score"))
    val model = Ols.fit(flagged.filter(col("is_train") === 1),
      Normalize.Features, Normalize.Target)
    val wire = ScoringPipeline.toWire(flagged)

    val topic = newTopic()
    val dir = Files.createTempDirectory("graft_fk_wh")
    val table = s"$dir/predictions"
    FileKafka.produce(wire, topic, numPartitions = 2)
    FileKafka.produce(Seq("corrupt {not json").toDF("value"), topic)

    val q = FileKafka.readStream(spark, topic)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // exactly what a Kafka consumer does: binary value → string
        ScoringPipeline.processBatch(model, table)(
          batch.withColumn("value", col("value").cast("string")), id)
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      assert(UpsertSink.ParquetMergeSink.read(spark, table).count() === 781)
      FileKafka.produce(wire, topic, numPartitions = 2) // at-least-once replay
      q.processAllAvailable()
      val warehouse = UpsertSink.ParquetMergeSink.read(spark, table)
      assert(warehouse.count() === 781) // T4 exactly-once via keyed upsert
      assert(warehouse.filter(col("y_pred").isNull).count() === 0)
    } finally q.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Production transport selection as CODE, not README prose: the wire
  * source/sink and the warehouse dialect are picked by config, so the
  * Kafka/Postgres swap is a config change with zero code edits.
  *
  *  - Wire: `format("kafka")` against a live broker, or the FileKafka
  *    V2 connector (Kafka's exact 7-column schema) in environments
  *    with no broker — both present the SAME shape downstream, so
  *    every transform is transport-agnostic.
  *  - Warehouse: the JDBC URL picks the upsert dialect — Postgres gets
  *    the reference's `INSERT … ON CONFLICT DO UPDATE`
  *    (`kafka/consumer.py:94-106`), anything else the portable
  *    UPDATE-else-INSERT that embedded Derby integration-tests here.
  *
  * ProductionTransportSpec drives the kafka/postgres paths end-to-end
  * and SKIPS (never fails) when no broker/DB is reachable — the
  * sandbox runs the FileKafka/Derby twins of the same entry points.
  */
object Transport {

  sealed trait Wire
  /** A real Kafka topic (needs the spark-sql-kafka connector jar). */
  final case class KafkaWire(bootstrap: String, topic: String,
                             options: Map[String, String] = Map.empty)
    extends Wire
  /** The file-backed stand-in with Kafka's exact column shape. */
  final case class FileWire(dir: String) extends Wire

  /** Streaming read of the wire — earliest offsets, Kafka's 7-column
    * schema either way. */
  def readWire(spark: SparkSession, wire: Wire): DataFrame = wire match {
    case KafkaWire(bs, topic, opts) =>
      opts.foldLeft(
        spark.readStream.format("kafka")
          .option("kafka.bootstrap.servers", bs)
          .option("subscribe", topic)
          .option("startingOffsets", "earliest")) {
        case (r, (k, v)) => r.option(k, v)
      }.load()
    case FileWire(dir) =>
      graft.kafka.FileKafka.readStream(spark, dir)
  }

  /** Batch-produce a one-`value`-column frame onto the wire. */
  def writeWire(batch: DataFrame, wire: Wire): Unit = wire match {
    case KafkaWire(bs, topic, opts) =>
      opts.foldLeft(
        batch.write.format("kafka")
          .option("kafka.bootstrap.servers", bs)
          .option("topic", topic)) {
        case (w, (k, v)) => w.option(k, v)
      }.save()
    case FileWire(dir) =>
      graft.kafka.FileKafka.produce(batch, dir)
  }

  /** Keyed warehouse endpoint; the URL picks the dialect. */
  final case class Warehouse(url: String, table: String, keyCols: Seq[String],
                             numConnections: Int = 4, batchSize: Int = 100) {
    def dialect: UpsertSink.Dialect =
      if (url.startsWith("jdbc:postgresql"))
        UpsertSink.Dialect.OnConflict
      else UpsertSink.Dialect.UpdateInsert
  }

  /** Idempotent keyed upsert of one micro-batch into the warehouse. */
  def upsert(batch: DataFrame, wh: Warehouse): Unit =
    UpsertSink.JdbcUpsert.upsertBatch(batch, wh.url, wh.table, wh.keyCols,
      batchSize = wh.batchSize, numConnections = wh.numConnections,
      dialect = wh.dialect)

  /** Wire selection from the environment — the deployment swap:
    * set `GRAFT_KAFKA_BOOTSTRAP` (+ optional `GRAFT_KAFKA_TOPIC`) and
    * every pipeline runs against the broker; unset, they run on the
    * file wire at `GRAFT_WIRE_DIR`. */
  def wireFromEnv(env: Map[String, String] = sys.env): Wire =
    env.get("GRAFT_KAFKA_BOOTSTRAP") match {
      case Some(bs) =>
        KafkaWire(bs, env.getOrElse("GRAFT_KAFKA_TOPIC", "graft"))
      case None =>
        FileWire(env.getOrElse("GRAFT_WIRE_DIR", "/tmp/graft-wire"))
    }

  /** Warehouse selection from the environment; `None` when no JDBC
    * endpoint is configured (pipelines then use the parquet merge
    * sink). */
  def warehouseFromEnv(keyCols: Seq[String],
                       env: Map[String, String] = sys.env): Option[Warehouse] =
    env.get("GRAFT_WAREHOUSE_URL").map { url =>
      Warehouse(url, env.getOrElse("GRAFT_WAREHOUSE_TABLE", "scores"), keyCols)
    }
}

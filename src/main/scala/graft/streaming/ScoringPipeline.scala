package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ml.Ols

/** The stream-scoring pipeline (SURVEY §3.2–3.3) re-expressed on
  * Structured Streaming: JSON wire records → schema-checked parse →
  * expression-based model scoring → (a) idempotent keyed upsert and
  * (b) stateful per-country running stats — two sinks off one source,
  * handled in a single `foreachBatch` (SURVEY §7.4.6).
  *
  * The wire format is the reference's flat Kafka JSON message
  * (`kafka/producer.py:92-103`, FIXTURES.md §3). The source is
  * pluggable: a Kafka `value` column, a file stream, or a MemoryStream
  * all present the same one-string-column shape (this container ships
  * no Kafka connector jar, so tests drive MemoryStream — the transforms
  * are source-agnostic either way).
  */
object ScoringPipeline {

  /** Exact wire schema (FIXTURES.md §3): flat JSON, 10 keys. */
  val wireSchema: StructType = StructType(Seq(
    StructField("Country", StringType),
    StructField("Year", IntegerType),
    StructField("GDP per capita", DoubleType),
    StructField("Social support", DoubleType),
    StructField("Healthy life expectancy", DoubleType),
    StructField("Freedom", DoubleType),
    StructField("Perceptions of corruption", DoubleType),
    StructField("y_true", DoubleType),
    StructField("is_train", IntegerType),
    StructField("is_test", IntegerType)))

  /** Producer side (S3): rows → single JSON `value` column. */
  def toWire(df: DataFrame): DataFrame =
    df.select(to_json(struct(wireSchema.fieldNames.map(col): _*)).as("value"))

  /** Consumer side (S4/T7): parse the wire column; corrupt records
    * yield a null struct → routed out, mirroring the reference's
    * per-record try/except skip (`consumer.py:223-226`). */
  def parseWire(df: DataFrame, value: Column): DataFrame =
    df.select(from_json(value, wireSchema).as("r"))
      .filter(col("r").isNotNull && col("r.Country").isNotNull)
      .select(col("r.*"))

  /** Score parsed records with the model expression (F10 — pure
    * Catalyst expression, constant-folded literals, no UDF). */
  def score(parsed: DataFrame, model: Ols.Model): DataFrame =
    parsed.withColumn("y_pred", model.scoreExpr)

  /** One micro-batch: upsert scored rows into the keyed warehouse table
    * (idempotent — replays are absorbed by the key, T4). */
  def upsertBatch(scored: DataFrame, tablePath: String): Unit =
    UpsertSink.ParquetMergeSink.merge(
      scored, tablePath, keyCols = Seq("Country", "Year", "is_train", "is_test"))

  /** Full wire → warehouse micro-batch body for foreachBatch. */
  def processBatch(model: Ols.Model, tablePath: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val scored = score(parseWire(batch, col("value")), model)
    upsertBatch(scored, tablePath)
  }

  /** The reference-shaped foreachBatch body: wire → parse → score →
    * idempotent JDBC upsert (`consumer.py:206-220` consumes, scores and
    * ON-CONFLICT-upserts each message; here a micro-batch replaces the
    * per-message loop). Dialect selects the upsert statement strategy —
    * integration tests run [[UpsertSink.Dialect.UpdateInsert]] against
    * embedded Derby; a Postgres deployment uses the default ON CONFLICT.
    */
  def processBatchJdbc(model: Ols.Model, url: String, table: String,
                       keyCols: Seq[String],
                       dialect: UpsertSink.Dialect = UpsertSink.Dialect.OnConflict,
                       numConnections: Int = 1)(
      batch: DataFrame, batchId: Long): Unit = {
    val scored = score(parseWire(batch, col("value")), model)
    UpsertSink.JdbcUpsert.upsertBatch(scored, url, table, keyCols,
      numConnections = numConnections, dialect = dialect)
  }
}

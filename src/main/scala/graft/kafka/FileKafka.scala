package graft.kafka

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.Base64

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A file-backed stand-in for the Kafka connector — same SCHEMA, same
  * offset semantics, no broker.
  *
  * The sandbox ships no spark-sql-kafka jar, so the reference's
  * transport (`kafka/producer.py:77-116` produce, `consumer.py:206-220`
  * earliest-offset consume) could previously only be spec'd at the
  * transform layer. This DataSource V2 connector closes that gap with a
  * durable-log emulation the streaming engine treats exactly like
  * Kafka:
  *
  *  - a *topic* is a directory; each *partition* is an append-only log
  *    file `partition-N.log`; the *offset* of a record is its line
  *    number — dense, totally ordered per partition, exactly Kafka's
  *    contract;
  *  - the batch read/micro-batch stream presents Kafka's exact column
  *    set `(key binary, value binary, topic string, partition int,
  *    offset long, timestamp timestamp, timestampType int)`, so
  *    downstream code (`parseWire(col("value").cast("string"))`) is
  *    byte-for-byte what runs against the real connector;
  *  - streaming starts from EARLIEST (`auto.offset.reset: 'earliest'`,
  *    consumer.py:210) and each micro-batch covers the per-partition
  *    offset range [committed, latest) — replays after checkpoint loss
  *    re-read from 0, which is why the downstream sink must be the
  *    idempotent upsert (T4);
  *  - the producer side is a V2 batch write: each task stages its rows
  *    in a temp segment, the driver commit appends segments to the
  *    partition logs — append-only, so concurrent readers only ever see
  *    a prefix (Kafka's own visibility rule).
  *
  * Record line format: `ts_millis \t base64(key) \t base64(value)` —
  * binary-safe and newline-free by construction. This transport is for
  * local integration tests; a cluster deployment swaps
  * `format("filekafka")` for `format("kafka")` with no other change.
  */
class FileKafkaProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "filekafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileKafka.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new FileKafkaTable(properties.get("path"))
}

object FileKafka {
  /** Kafka source schema, field for field. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private[kafka] def partitionFile(dir: Path, p: Int): Path =
    dir.resolve(s"partition-$p.log")

  private[kafka] def listPartitions(dir: Path): Seq[Int] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      // Files.list holds a directory handle until closed; this runs once
      // per micro-batch trigger (latestOffset -> endOffsets), so an
      // unclosed stream leaks an fd per trigger on a long-running query.
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("partition-") && n.endsWith(".log") =>
          n.stripPrefix("partition-").stripSuffix(".log").toInt }
        .toSeq.sorted
      finally s.close()
    }

  private[kafka] def lineCount(f: Path): Long =
    if (!Files.exists(f)) 0L
    else {
      val in = Files.newInputStream(f)
      try {
        var n = 0L
        val buf = new Array[Byte](1 << 16)
        var read = in.read(buf)
        while (read > 0) {
          var i = 0
          while (i < read) { if (buf(i) == '\n') n += 1; i += 1 }
          read = in.read(buf)
        }
        n
      } finally in.close()
    }

  /** Current per-partition end offsets (the "latest" offsets). */
  private[kafka] def endOffsets(dir: Path): Map[Int, Long] =
    listPartitions(dir).map(p => p -> lineCount(partitionFile(dir, p))).toMap

  /** Producer helper: append `df`'s `value` (and optional `key`) column
    * to the topic at `dir`, distributing tasks round-robin over
    * `numPartitions` logs — the reference producer's send loop. */
  def produce(df: DataFrame, dir: String, numPartitions: Int = 1): Unit =
    df.write.format("filekafka")
      .option("path", dir)
      .option("numPartitions", numPartitions.toString)
      .mode("append")
      .save()

  /** Consumer helper: the earliest-offset streaming read. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.format("filekafka").option("path", dir).load()
}

class FileKafkaTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "filekafka requires a path option")
  override def name(): String = s"filekafka:$path"
  override def schema(): StructType = FileKafka.schema
  // ACCEPT_ANY_SCHEMA: producers write a bare `value` (+ optional
  // `key`) column, not the 7-column read schema — the same capability
  // the real Kafka table declares to skip append-schema validation
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new FileKafkaScan(path)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new FileKafkaWrite(path, info.schema(),
        Option(info.options.get("numPartitions")).map(_.toInt).getOrElse(1))
    }
}

// ------------------------------------------------------------------ read

/** (partition, file, startOffset, endOffset) split — one per topic
  * partition, preserving Kafka's per-partition ordering. */
case class FileKafkaInputPartition(topic: String, partition: Int, file: String,
                                   start: Long, end: Long) extends InputPartition

class FileKafkaScan(path: String) extends Scan {
  override def readSchema(): StructType = FileKafka.schema
  override def description(): String = s"filekafka scan of $path"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val dir = Paths.get(path)
      FileKafka.endOffsets(dir).toSeq.sortBy(_._1).map { case (p, end) =>
        FileKafkaInputPartition(dir.getFileName.toString, p,
          FileKafka.partitionFile(dir, p).toString, 0L, end)
      }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new FileKafkaReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FileKafkaMicroBatchStream(path)
}

/** Offset = per-partition line counts, serialized as sorted JSON. */
case class FileKafkaOffset(counts: Map[Int, Long]) extends Offset {
  override def json(): String =
    counts.toSeq.sortBy(_._1)
      .map { case (p, n) => s""""$p":$n""" }.mkString("{", ",", "}")
}
object FileKafkaOffset {
  def parse(json: String): FileKafkaOffset = {
    val body = json.trim.stripPrefix("{").stripSuffix("}")
    if (body.isEmpty) FileKafkaOffset(Map.empty)
    else FileKafkaOffset(body.split(",").map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
    }.toMap)
  }
}

class FileKafkaMicroBatchStream(path: String) extends MicroBatchStream {
  private val dir = Paths.get(path)
  private val topic = dir.getFileName.toString

  // earliest-offset semantics (consumer.py:210): a fresh query begins
  // at offset 0 of every partition existing at start
  override def initialOffset(): Offset =
    FileKafkaOffset(FileKafka.listPartitions(dir).map(_ -> 0L).toMap)

  override def latestOffset(): Offset = FileKafkaOffset(FileKafka.endOffsets(dir))

  override def deserializeOffset(json: String): Offset = FileKafkaOffset.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FileKafkaOffset].counts
    val e = end.asInstanceOf[FileKafkaOffset].counts
    e.toSeq.sortBy(_._1).flatMap { case (p, endOff) =>
      val startOff = s.getOrElse(p, 0L) // partitions born mid-stream start at 0
      if (endOff > startOff)
        Some(FileKafkaInputPartition(topic, p,
          FileKafka.partitionFile(dir, p).toString, startOff, endOff))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FileKafkaReaderFactory

  override def commit(end: Offset): Unit = () // engine checkpoints offsets
  override def stop(): Unit = ()
}

class FileKafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FileKafkaInputPartition]
    new PartitionReader[InternalRow] {
      private val lines = Files.readAllLines(
        Paths.get(p.file), StandardCharsets.UTF_8)
      private var idx = p.start
      private var row: InternalRow = _

      override def next(): Boolean =
        if (idx >= p.end || idx >= lines.size()) false
        else {
          val parts = lines.get(idx.toInt).split("\t", -1)
          val ts = parts(0).toLong
          val key = if (parts(1).isEmpty) null else Base64.getDecoder.decode(parts(1))
          val value = Base64.getDecoder.decode(parts(2))
          row = new GenericInternalRow(Array[Any](
            key, value, UTF8String.fromString(p.topic), p.partition, idx,
            ts * 1000L /* millis → micros */, 0 /* CREATE_TIME */))
          idx += 1
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

// ----------------------------------------------------------------- write

case class FileKafkaCommit(partition: Int, tempFile: String) extends WriterCommitMessage

class FileKafkaWrite(path: String, inputSchema: StructType,
                     numPartitions: Int) extends Write {
  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new FileKafkaWriterFactory(path, inputSchema, numPartitions)

    /** Driver-side commit: append every staged segment to its partition
      * log in task order. Readers tail line counts, so they observe a
      * prefix of the log at every instant — records become visible
      * atomically per segment. */
    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val dir = Paths.get(path)
      Files.createDirectories(dir)
      messages.collect { case m: FileKafkaCommit => m }
        .sortBy(_.tempFile).foreach { m =>
          val tmp = Paths.get(m.tempFile)
          val target = FileKafka.partitionFile(dir, m.partition)
          Files.write(target, Files.readAllBytes(tmp),
            StandardOpenOption.CREATE, StandardOpenOption.APPEND)
          Files.delete(tmp)
        }
    }
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      messages.collect { case m: FileKafkaCommit => m }
        .foreach(m => Files.deleteIfExists(Paths.get(m.tempFile)): Unit)
  }
}

class FileKafkaWriterFactory(path: String, inputSchema: StructType,
                             numPartitions: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val valueIdx = inputSchema.fieldIndex("value")
    val valueIsString = inputSchema(valueIdx).dataType == StringType
    val keyIdx = if (inputSchema.fieldNames.contains("key"))
      inputSchema.fieldIndex("key") else -1
    // ACCEPT_ANY_SCHEMA admits string OR binary for both columns — the
    // real Kafka writer casts either; mirror that for key, not just value.
    val keyIsString = keyIdx >= 0 && inputSchema(keyIdx).dataType == StringType
    val targetPartition = partitionId % numPartitions

    new DataWriter[InternalRow] {
      private val buf = new StringBuilder
      override def write(r: InternalRow): Unit = {
        val value =
          if (valueIsString) r.getUTF8String(valueIdx).getBytes
          else r.getBinary(valueIdx)
        val key =
          if (keyIdx < 0 || r.isNullAt(keyIdx)) ""
          else if (keyIsString)
            Base64.getEncoder.encodeToString(r.getUTF8String(keyIdx).getBytes)
          else Base64.getEncoder.encodeToString(r.getBinary(keyIdx))
        buf.append(System.currentTimeMillis()).append('\t')
          .append(key).append('\t')
          .append(Base64.getEncoder.encodeToString(value)).append('\n')
      }
      override def commit(): WriterCommitMessage = {
        val dir = Paths.get(path)
        Files.createDirectories(dir)
        val tmp = Files.createTempFile(dir,
          f".seg-$taskId%05d-$partitionId%05d-", ".tmp")
        Files.write(tmp, buf.toString.getBytes(StandardCharsets.UTF_8))
        FileKafkaCommit(targetPartition, tmp.toString)
      }
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
  }
}

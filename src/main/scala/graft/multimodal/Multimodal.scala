package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media
  * payloads travel as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction runs per partition so heavy
  * native decoders initialize once per task, not once per row.
  *
  * The decoders themselves are STUBBED with deterministic fakes — this
  * container ships no image/audio codecs — but the Spark-side contract
  * (schema, batching, partition sizing, feature shapes) is real and
  * tested; swap `decoder` for a JNI/FFmpeg/libvips call in production.
  *
  * Scale design: payloads never pass through a shuffle — decode is a
  * narrow mapPartitions directly over the scan; `repartitionForPayloads`
  * sizes tasks by byte budget (not row count) so a partition of 4 MB
  * thumbnails and one of 40 MB videos get comparable work.
  */
object Multimodal {

  /** media table schema: (id, media binary, meta struct). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))), nullable = true)))

  /** Deterministic fake "decode" — a stand-in for a real image decoder:
    * hashes the payload into a fixed-length feature vector. Marked
    * clearly as a STUB; only the hash math is fake, the pipeline
    * plumbing around it is the real contract. */
  def stubDecodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      out(j) = ((h & 0xffffff).toFloat / 0xffffff) * 2f - 1f
      j += 1
    }
    out
  }

  /** Decode/feature-extract: per-partition batch iterator over the
    * binary column → (media_id, features array<float>). The decoder is
    * injected; partitions stream row-by-row (no whole-partition
    * buffering), so memory is bounded by one payload. */
  def extractFeatures(df: DataFrame, dim: Int = 16,
                      decoder: (Array[Byte], Int) => Array[Float] = stubDecodeFeatures)
      : DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val ds: Dataset[Row] = df.select("media_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
        Row(id, decoder(bytes, dim).toSeq)
      }
    }(enc)
    ds.toDF()
  }

  /** Frame sampling for video-shaped payloads: emit every `everyN`-th
    * "frame" (stub: fixed-size byte windows) as its own row —
    * explode-shaped, no shuffle. */
  def sampleFrames(df: DataFrame, everyN: Int, frameBytes: Int = 1024): DataFrame = {
    val nFrames = (length(col("media")) / frameBytes).cast("int")
    df.select(col("media_id"), col("media"),
      explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(everyN))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        substring(col("media"), col("frame_idx") * frameBytes + 1, lit(frameBytes)).as("frame"))
  }

  /** Byte-budget repartitioning: aim for `targetBytes` of payload per
    * task. One cheap size aggregate, then a hash repartition — at 100 TB
    * this is what keeps decode tasks uniform despite skewed payloads. */
  def repartitionForPayloads(df: DataFrame, targetBytes: Long = 128L << 20): DataFrame = {
    val totalBytes = df.agg(sum(coalesce(length(col("media")), lit(0))))
      .head().getLong(0)
    val parts = math.max(1, math.min(100000, totalBytes / math.max(1L, targetBytes))).toInt
    df.repartition(parts)
  }
}

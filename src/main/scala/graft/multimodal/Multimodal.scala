package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media
  * payloads travel as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction runs per partition so heavy
  * native decoders initialize once per task, not once per row.
  *
  * Two decode tiers:
  *
  *  - **Header / metadata decode is REAL**: [[parseImageHeader]] reads
  *    the PNG signature + IHDR chunk (ISO 15948 §5.2/11.2.2: fixed
  *    offsets — width/height as 4-byte big-endian at bytes 16/20, bit
  *    depth at 24, colour type at 25) and walks a JPEG marker-segment
  *    stream (ITU-T T.81 §B.1/B.2.2: `FF xx` marker + 2-byte big-endian
  *    length) to the SOF0/1/2 frame header for height/width/precision/
  *    component count. Both are pure column expressions over
  *    `BinaryType` — fixed-offset byte reads via substr+hex+conv, no
  *    UDF, fully pushdown/codegen-friendly and cross-checkable in any
  *    engine that can slice hex strings.
  *  - **Pixel decode stays a STUB** ([[stubDecodeFeatures]]): this
  *    container ships no image/audio codecs, so the feature extractor
  *    hashes payload bytes into a deterministic fake vector. The
  *    Spark-side contract (schema, batching, partition sizing, feature
  *    shapes) is real and tested; swap `decoder` for a JNI/FFmpeg/
  *    libvips call in production.
  *
  * Scale design: payloads never pass through a shuffle — decode is a
  * narrow mapPartitions directly over the scan; `repartitionForPayloads`
  * sizes tasks by byte budget (not row count) so a partition of 4 MB
  * thumbnails and one of 40 MB videos get comparable work.
  */
object Multimodal {

  /** PNG file signature (ISO 15948 §5.2), hex. */
  val PngMagicHex = "89504E470D0A1A0A"

  /** SOF markers that carry frame dimensions: baseline (C0), extended
    * sequential (C1), progressive (C2) — ITU-T T.81 Table B.1. */
  val JpegSofMarkers: Seq[Long] = Seq(0xC0L, 0xC1L, 0xC2L)

  /** Bounded depth of the JPEG marker-segment walk: APP0..APPn, COM,
    * DQT etc. before the SOF. Real camera JPEGs front-load a handful of
    * segments; raise for exotic files. */
  val JpegMaxSegments = 6

  /** Big-endian unsigned read of `len` bytes at 0-based offset `off`
    * (column) of a binary column — substr → hex → base-16 conv. */
  private def beAt(media: Column, off: Column, len: Int): Column =
    conv(hex(media.substr(off + lit(1L), lit(len.toLong))), 16, 10).cast("long")

  private def u8At(media: Column, off: Column): Column = beAt(media, off, 1)

  /** 0-based byte offset of the SOF marker in a JPEG payload, or null
    * when none is found within [[JpegMaxSegments]] segments. Implemented
    * as an `aggregate` HOF fold (state = (cursor, found)) so the
    * expression tree stays LINEAR in the segment budget — an unrolled
    * when-chain would double the tree per step. */
  def jpegSofOffset(media: Column, maxSegments: Int = JpegMaxSegments): Column =
    aggregate(
      sequence(lit(1), lit(maxSegments)),
      struct(lit(2L).as("off"), lit(null).cast("long").as("sof")),
      (acc, _) => {
        val off = acc.getField("off")
        val sof = acc.getField("sof")
        // a usable segment: nothing found yet, marker byte is FF, and
        // the smallest SOF payload (10 bytes incl. marker+length) fits
        val ok = sof.isNull &&
          (off + lit(10L)) <= length(media).cast("long") &&
          u8At(media, off) === lit(0xFFL)
        val isSof = ok && u8At(media, off + lit(1L)).isin(JpegSofMarkers: _*)
        struct(
          when(isSof || !ok, off)
            .otherwise(off + lit(2L) + beAt(media, off + lit(2L), 2)).as("off"),
          when(sof.isNotNull, sof).when(isSof, off).as("sof"))
      },
      acc => acc.getField("sof"))

  /** Parse a PNG or JPEG header out of a binary payload: returns a
    * struct (format, width, height, bit_depth, channels) with format in
    * {png, jpeg, unknown} and null numeric fields when undecodable.
    * Pure expressions — runs inside the scan projection, no shuffle,
    * no UDF. */
  def parseImageHeader(media: Column,
                       maxSegments: Int = JpegMaxSegments): Column = {
    val isPng = length(media) >= 26 &&
      hex(substring(media, 1, 8)) === lit(PngMagicHex)
    val isJpeg = length(media) >= 4 &&
      hex(substring(media, 1, 2)) === lit("FFD8")
    // IHDR colour type → channel count (ISO 15948 Table 11.1)
    val pngColor = beAt(media, lit(25L), 1)
    val pngChannels = when(pngColor === 0L, 1L).when(pngColor === 2L, 3L)
      .when(pngColor === 3L, 1L).when(pngColor === 4L, 2L)
      .when(pngColor === 6L, 4L)
    val sof = jpegSofOffset(media, maxSegments)
    // SOF payload layout: marker(2) length(2) precision(1) height(2)
    // width(2) nComponents(1) — T.81 §B.2.2
    struct(
      when(isPng, lit("png")).when(isJpeg, lit("jpeg"))
        .otherwise(lit("unknown")).as("format"),
      when(isPng, beAt(media, lit(16L), 4))
        .when(isJpeg, beAt(media, sof + lit(7L), 2)).as("width"),
      when(isPng, beAt(media, lit(20L), 4))
        .when(isJpeg, beAt(media, sof + lit(5L), 2)).as("height"),
      when(isPng, beAt(media, lit(24L), 1))
        .when(isJpeg, beAt(media, sof + lit(4L), 1)).as("bit_depth"),
      when(isPng, pngChannels)
        .when(isJpeg, beAt(media, sof + lit(9L), 1)).as("channels"))
  }

  /** Deterministic synthetic media corpus derived from a documents
    * table: REAL format byte streams (PNG signature + IHDR; JPEG
    * SOI → APP0/JFIF → variable-length COM → SOF0 → EOI), dimensions
    * and channel counts derived from the id, body bytes from
    * md5(text). The variable-length COM segment is load-bearing: it
    * shifts the SOF offset per row, so a fixed-offset "parser" cannot
    * pass — only a real segment walk can. (The PNG IHDR CRC is a
    * zeroed placeholder; the parser does not validate CRCs.) */
  def syntheticMedia(docs: DataFrame,
                     idCol: Column = col("doc_id"),
                     textCol: Column = col("text")): DataFrame = {
    val id = idCol.cast("long")
    def be(v: Column, n: Int): Column = unhex(lpad(hex(v), 2 * n, "0"))
    val w = lit(16L) + id % 1009L
    val h = lit(16L) + (id * 7L) % 997L
    val pngColor = when(id % 3L === 0L, 0L).when(id % 3L === 1L, 2L).otherwise(6L)
    val ch = lit(1L) + id % 3L
    val comLen = id % 13L + 1L
    val body = unhex(md5(textCol))
    val png = concat(
      unhex(lit(PngMagicHex + "0000000D49484452")),
      be(w, 4), be(h, 4), unhex(lit("08")), be(pngColor, 1),
      unhex(lit("00000000000000")), // compression+filter+interlace + CRC placeholder
      body)
    val jpeg = concat(
      unhex(lit("FFD8FFE000104A46494600010100000100010000")), // SOI + 18-byte JFIF APP0
      unhex(lit("FFFE")), be(comLen + lit(2L), 2),            // COM, 2-byte length
      body.substr(lit(1L), comLen),                           // 1..13 comment bytes
      unhex(lit("FFC0")), be(lit(8L) + ch * lit(3L), 2),      // SOF0, length 8+3·ch
      unhex(lit("08")), be(h, 2), be(w, 2), be(ch, 1),        // precision, dims, ch
      unhex(lit("011100021100031100")).substr(lit(1L), ch * lit(3L)), // component specs
      unhex(lit("FFD9")))                                     // EOI
    docs.select(id.as("media_id"),
      when(id % 97L === 0L, body)   // headerless payload → format=unknown
        .when(id % 2L === 0L, png)
        .otherwise(jpeg).as("media"))
  }

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

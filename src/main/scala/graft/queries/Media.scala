package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal metadata queries: REAL image-header decode (PNG IHDR +
  * JPEG SOF marker walk) over binary payloads, oracle-checked — the
  * DuckDB side replays both the byte-stream construction and the
  * segment walk in hex-string space, generated from the same constants
  * as the Spark plan so the two cannot drift.
  *
  * 100 TB shape: the parse is a pure per-row projection fused into the
  * scan (no UDF, no shuffle); only the tiny (id, meta) result ever
  * moves. Payload bytes never leave the executor that read them.
  */
object Media {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q97
  // Synthetic media corpus (real PNG/JPEG byte streams derived from the
  // documents table — the variable-length COM segment shifts the JPEG
  // SOF offset per row) decoded back via the header parsers.
  val q97_image_meta: Q = (s, dir) => {
    val m = Multimodal.syntheticMedia(Tables.load(s, dir, "documents"))
    val meta = Multimodal.parseImageHeader(col("media"))
    m.select(
      col("media_id").as("doc_id"),
      meta.getField("format").as("format"),
      meta.getField("width").as("width"),
      meta.getField("height").as("height"),
      meta.getField("bit_depth").as("bit_depth"),
      meta.getField("channels").as("channels"),
      length(col("media")).cast("long").as("payload_bytes"))
      .orderBy("doc_id")
  }

  /** Byte read at 0-based offset `off` of the hex-encoded payload. */
  private def b1(off: String) =
    s"CAST('0x' || substr(hexs, 2*($off) + 1, 2) AS BIGINT)"

  /** Big-endian read of `n` bytes at 0-based offset `off`. */
  private def bn(off: String, n: Int) =
    s"CAST('0x' || substr(hexs, 2*($off) + 1, ${2 * n}) AS BIGINT)"

  val q97_sql: String = {
    val sofSet = Multimodal.JpegSofMarkers.mkString(", ")
    // the bounded marker-segment walk, one CTE per step (linear, named
    // references — the SQL twin of the Spark-side aggregate() fold)
    val steps = (1 to Multimodal.JpegMaxSegments).map { k =>
      s"""s$k AS (SELECT doc_id, hexs,
         |  CASE WHEN sof IS NOT NULL OR off + 10 > CAST(length(hexs)/2 AS BIGINT)
         |            OR ${b1("off")} <> 255 THEN off
         |       WHEN ${b1("off + 1")} IN ($sofSet) THEN off
         |       ELSE off + 2 + ${bn("off + 2", 2)} END AS off,
         |  CASE WHEN sof IS NOT NULL THEN sof
         |       WHEN off + 10 <= CAST(length(hexs)/2 AS BIGINT) AND ${b1("off")} = 255
         |            AND ${b1("off + 1")} IN ($sofSet) THEN off
         |       END AS sof
         |  FROM s${k - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH m AS (SELECT doc_id, upper(CASE
       |    WHEN doc_id % 97 = 0 THEN md5(text)
       |    WHEN doc_id % 2 = 0 THEN
       |      '${Multimodal.PngMagicHex}0000000D49484452'
       |      || lpad(to_hex(16 + doc_id % 1009), 8, '0')
       |      || lpad(to_hex(16 + (doc_id * 7) % 997), 8, '0')
       |      || '08'
       |      || lpad(to_hex(CASE WHEN doc_id % 3 = 0 THEN 0
       |                          WHEN doc_id % 3 = 1 THEN 2 ELSE 6 END), 2, '0')
       |      || '00000000000000'
       |      || md5(text)
       |    ELSE
       |      'FFD8FFE000104A46494600010100000100010000'
       |      || 'FFFE' || lpad(to_hex(doc_id % 13 + 3), 4, '0')
       |      || substr(md5(text), 1, CAST(2 * (doc_id % 13 + 1) AS INT))
       |      || 'FFC0' || lpad(to_hex(8 + 3 * (1 + doc_id % 3)), 4, '0')
       |      || '08'
       |      || lpad(to_hex(16 + (doc_id * 7) % 997), 4, '0')
       |      || lpad(to_hex(16 + doc_id % 1009), 4, '0')
       |      || lpad(to_hex(1 + doc_id % 3), 2, '0')
       |      || substr('011100021100031100', 1, CAST(6 * (1 + doc_id % 3) AS INT))
       |      || 'FFD9'
       |  END) AS hexs FROM documents),
       |s0 AS (SELECT doc_id, hexs, CAST(2 AS BIGINT) AS off,
       |              CAST(NULL AS BIGINT) AS sof FROM m),
       |$steps,
       |p AS (SELECT doc_id, hexs, sof,
       |   substr(hexs, 1, 16) = '${Multimodal.PngMagicHex}'
       |     AND length(hexs) >= 52 AS is_png,
       |   substr(hexs, 1, 4) = 'FFD8' AND length(hexs) >= 8 AS is_jpeg
       | FROM s${Multimodal.JpegMaxSegments})
       |SELECT doc_id,
       |  CASE WHEN is_png THEN 'png' WHEN is_jpeg THEN 'jpeg'
       |       ELSE 'unknown' END AS format,
       |  CASE WHEN is_png THEN ${bn("16", 4)}
       |       WHEN is_jpeg THEN ${bn("sof + 7", 2)} END AS width,
       |  CASE WHEN is_png THEN ${bn("20", 4)}
       |       WHEN is_jpeg THEN ${bn("sof + 5", 2)} END AS height,
       |  CASE WHEN is_png THEN ${bn("24", 1)}
       |       WHEN is_jpeg THEN ${bn("sof + 4", 1)} END AS bit_depth,
       |  CASE WHEN is_png THEN
       |         CASE ${bn("25", 1)} WHEN 0 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 1
       |                             WHEN 4 THEN 2 WHEN 6 THEN 4 END
       |       WHEN is_jpeg THEN ${bn("sof + 9", 1)} END AS channels,
       |  CAST(length(hexs) / 2 AS BIGINT) AS payload_bytes
       |FROM p ORDER BY doc_id""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q97_image_meta" -> q97_image_meta)

  val oracle: Map[String, String] = Map(
    "q97_image_meta" -> q97_sql)
}

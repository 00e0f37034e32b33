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
    // two-step select, like q100: the parse struct is projected once
    m.select(
      col("media_id").as("doc_id"),
      Multimodal.parseImageHeader(col("media")).as("m"),
      length(col("media")).cast("long").as("payload_bytes"))
      .select(col("doc_id"),
        col("m.format").as("format"),
        col("m.width").as("width"),
        col("m.height").as("height"),
        col("m.bit_depth").as("bit_depth"),
        col("m.channels").as("channels"),
        col("payload_bytes"))
      .orderBy("doc_id")
  }

  /** Byte read at 0-based offset `off` of the hex-encoded payload. */
  private def b1(off: String) =
    s"CAST('0x' || substr(hexs, 2*($off) + 1, 2) AS BIGINT)"

  /** Big-endian read of `n` bytes at 0-based offset `off`. */
  private def bn(off: String, n: Int) =
    s"CAST('0x' || substr(hexs, 2*($off) + 1, ${2 * n}) AS BIGINT)"

  /** PNG/JPEG hex construction (same constants as syntheticMedia). */
  private def imgHexSql(where: String): String =
    s"""SELECT doc_id, upper(CASE
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
       |  END) AS hexs FROM documents $where""".stripMargin

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
    "WITH m AS (" + imgHexSql("") + "),\n" +
      s"""s0 AS (SELECT doc_id, hexs, CAST(2 AS BIGINT) AS off,
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

  // --------------------------------------------------------------- q100
  // Synthetic WAV corpus (real RIFF byte streams; an optional odd-length
  // LIST chunk shifts the fmt offset AND exercises the even-padding
  // rule) decoded back via the little-endian chunk walk.
  val q100_audio_meta: Q = (s, dir) => {
    val m = Multimodal.syntheticWav(Tables.load(s, dir, "documents"))
    // two-step select: the chunk-walk fold is projected ONCE as `m`,
    // then fields are extracted from the materialized struct — a
    // single flat select would splice a copy of the walk into every
    // output column (CollapseProject rightly refuses to merge these)
    m.select(
      col("media_id").as("doc_id"),
      Multimodal.parseWavHeader(col("media")).as("m"),
      length(col("media")).cast("long").as("payload_bytes"))
      .select(col("doc_id"),
        col("m.format").as("format"),
        col("m.channels").as("channels"),
        col("m.sample_rate").as("sample_rate"),
        col("m.bits_per_sample").as("bits_per_sample"),
        col("m.n_samples").as("n_samples"),
        col("m.duration_ms").as("duration_ms"),
        col("payload_bytes"))
      .orderBy("doc_id")
  }

  /** Little-endian read of `n` bytes at 0-based offset `off` —
    * reversed byte pairs of the hex string. */
  private def ln(off: String, n: Int) = {
    val pairs = (n - 1 to 0 by -1)
      .map(i => s"substr(hexs, 2*($off + $i) + 1, 2)").mkString(" || ")
    s"CAST('0x' || $pairs AS BIGINT)"
  }

  /** Little-endian hex ENCODING of SQL expression `v` in `n` bytes —
    * the construction-side twin of [[ln]]. */
  private def lew(v: String, n: Int) = {
    val h = s"lpad(to_hex($v), ${2 * n}, '0')"
    (n - 1 to 0 by -1).map(i => s"substr($h, ${2 * i + 1}, 2)").mkString(" || ")
  }

  /** WAV hex construction (same constants as syntheticWav) as a bare
    * SELECT — reused by q217's mixed census with a slice filter. */
  private def wavHexSql(where: String): String = {
    // id-derived fmt fields — same constants as syntheticWav
    val nCh = "(1 + doc_id % 2)"
    val sr = "(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END)"
    val bps = "(CASE WHEN doc_id % 5 < 2 THEN 1 ELSE 2 END)"
    val dataLen = "(doc_id % 9 + 8)"
    val listLen = "(doc_id % 7 + 1)"
    s"""SELECT doc_id, upper(CASE
       |    WHEN doc_id % 89 = 0 THEN md5(text)
       |    ELSE '52494646'
       |      || ${lew(s"4 + CASE WHEN doc_id % 2 = 0 THEN 12 + $listLen + $listLen % 2 ELSE 0 END + 32 + $dataLen", 4)}
       |      || '57415645'
       |      || CASE WHEN doc_id % 2 = 0 THEN
       |           '4C495354' || ${lew(s"$listLen + 4", 4)} || '494E464F'
       |           || substr(md5(text), 1, CAST(2 * $listLen AS INT))
       |           || CASE WHEN $listLen % 2 = 1 THEN '00' ELSE '' END
       |         ELSE '' END
       |      || '666D7420' || ${lew("16", 4)} || ${lew("1", 2)}
       |      || ${lew(nCh, 2)} || ${lew(sr, 4)} || ${lew(s"$sr * $nCh * $bps", 4)}
       |      || ${lew(s"$nCh * $bps", 2)} || ${lew(s"8 * $bps", 2)}
       |      || '64617461' || ${lew(dataLen, 4)}
       |      || substr(md5(text), 1, CAST(2 * $dataLen AS INT))
       |  END) AS hexs FROM documents $where""".stripMargin
  }

  /** The RIFF/WAVE fmt+data chunk walk over `src(doc_id, hexs)`:
    * emits step CTEs `${p}0..${p}WavMaxChunks` carrying (doc_id, hexs,
    * off, fmt, dsize). Returns (ctesSql, lastStepName). */
  private def wavWalkSql(src: String, p: String): (String, String) = {
    val inBounds = "off + 8 <= CAST(length(hexs)/2 AS BIGINT)"
    val open = s"(fmt IS NULL OR dsize IS NULL) AND $inBounds"
    val steps = (1 to Multimodal.WavMaxChunks).map { k =>
      s"""$p$k AS (SELECT doc_id, hexs,
         |  CASE WHEN $open
         |       THEN least(off + 8 + ${ln("off + 4", 4)} + ${ln("off + 4", 4)} % 2,
         |                  CAST(length(hexs)/2 AS BIGINT))
         |       ELSE off END AS off,
         |  CASE WHEN fmt IS NOT NULL THEN fmt
         |       WHEN $open AND substr(hexs, 2*off + 1, 8) = '666D7420'
         |       THEN off + 8 END AS fmt,
         |  CASE WHEN dsize IS NOT NULL THEN dsize
         |       WHEN $open AND substr(hexs, 2*off + 1, 8) = '64617461'
         |       THEN ${ln("off + 4", 4)} END AS dsize
         |  FROM $p${k - 1})""".stripMargin
    }.mkString(",\n")
    (s"""${p}0 AS (SELECT doc_id, hexs, CAST(12 AS BIGINT) AS off,
       |       CAST(NULL AS BIGINT) AS fmt, CAST(NULL AS BIGINT) AS dsize FROM $src),
       |$steps""".stripMargin, s"$p${Multimodal.WavMaxChunks}")
  }

  /** The full parseWavHeader validity over a walk end-state row. */
  private val wavOkSql: String =
    "substr(hexs, 1, 8) = '52494646' AND substr(hexs, 17, 8) = '57415645'" +
      " AND length(hexs) >= 88 AND fmt IS NOT NULL AND dsize IS NOT NULL"

  val q100_sql: String = {
    val (walk, last) = wavWalkSql("m", "s")
    "WITH m AS (" + wavHexSql("") + "),\n" + walk + ",\n" +
      s"""p AS (SELECT doc_id, hexs, fmt, dsize,
       |   $wavOkSql AS ok
       | FROM $last)
       |SELECT doc_id,
       |  CASE WHEN ok THEN 'wav' ELSE 'unknown' END AS format,
       |  CASE WHEN ok THEN ${ln("fmt + 2", 2)} END AS channels,
       |  CASE WHEN ok THEN ${ln("fmt + 4", 4)} END AS sample_rate,
       |  CASE WHEN ok THEN ${ln("fmt + 14", 2)} END AS bits_per_sample,
       |  CASE WHEN ok THEN CAST(floor(dsize / ${ln("fmt + 12", 2)}) AS BIGINT) END AS n_samples,
       |  CASE WHEN ok THEN CAST(floor(dsize * 1000 / ${ln("fmt + 8", 4)}) AS BIGINT) END AS duration_ms,
       |  CAST(length(hexs) / 2 AS BIGINT) AS payload_bytes
       |FROM p ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q102
  // Synthetic AVI corpus (real RIFF/'AVI ' streams; an optional
  // odd-length JUNK chunk shifts the LIST/'hdrl' offset and exercises
  // padding) decoded back via the avih MainAVIHeader walk.
  val q102_video_meta: Q = (s, dir) => {
    val m = Multimodal.syntheticAvi(Tables.load(s, dir, "documents"))
    m.select(
      col("media_id").as("doc_id"),
      Multimodal.parseAviHeader(col("media")).as("m"),
      length(col("media")).cast("long").as("payload_bytes"))
      .select(col("doc_id"),
        col("m.format").as("format"),
        col("m.width").as("width"),
        col("m.height").as("height"),
        col("m.n_frames").as("n_frames"),
        col("m.n_streams").as("n_streams"),
        col("m.micro_sec_per_frame").as("micro_sec_per_frame"),
        col("m.duration_ms").as("duration_ms"),
        col("payload_bytes"))
      .orderBy("doc_id")
  }

  /** AVI hex construction (same constants as syntheticAvi). */
  private def aviHexSql(where: String): String = {
    val mspf = "(CASE doc_id % 3 WHEN 0 THEN 33333 WHEN 1 THEN 41708 ELSE 16667 END)"
    val frames = "(10 + doc_id % 990)"
    val streams = "(1 + doc_id % 2)"
    val w = "(160 + doc_id % 1280)"
    val h = "(120 + (doc_id * 3) % 720)"
    val junkLen = "(doc_id % 11 + 1)"
    val zero4 = lew("0", 4)
    s"""SELECT doc_id, upper(CASE
       |    WHEN doc_id % 83 = 0 THEN md5(text)
       |    ELSE '52494646'
       |      || ${lew(s"4 + CASE WHEN doc_id % 2 = 0 THEN 8 + $junkLen + $junkLen % 2 ELSE 0 END + 76 + 12", 4)}
       |      || '41564920'
       |      || CASE WHEN doc_id % 2 = 0 THEN
       |           '4A554E4B' || ${lew(junkLen, 4)}
       |           || substr(md5(text), 1, CAST(2 * $junkLen AS INT))
       |           || CASE WHEN $junkLen % 2 = 1 THEN '00' ELSE '' END
       |         ELSE '' END
       |      || '4C495354' || ${lew("68", 4)} || '6864726C'
       |      || '61766968' || ${lew("56", 4)}
       |      || ${lew(mspf, 4)} || $zero4 || $zero4 || ${lew("16", 4)}
       |      || ${lew(frames, 4)} || $zero4 || ${lew(streams, 4)} || $zero4
       |      || ${lew(w, 4)} || ${lew(h, 4)} || $zero4 || $zero4 || $zero4 || $zero4
       |      || '4C495354' || ${lew("4", 4)} || '6D6F7669'
       |  END) AS hexs FROM documents $where""".stripMargin
  }

  /** The RIFF/AVI LIST-'hdrl' walk over `src(doc_id, hexs)`. */
  private def aviWalkSql(src: String, p: String): (String, String) = {
    val inBounds = "off + 12 <= CAST(length(hexs)/2 AS BIGINT)"
    val open = s"hdrl IS NULL AND $inBounds"
    val isHdrl = s"$open AND substr(hexs, 2*off + 1, 8) = '4C495354'" +
      " AND substr(hexs, 2*off + 17, 8) = '6864726C'"
    val steps = (1 to Multimodal.WavMaxChunks).map { k =>
      s"""$p$k AS (SELECT doc_id, hexs,
         |  CASE WHEN $open AND NOT ($isHdrl)
         |       THEN least(off + 8 + ${ln("off + 4", 4)} + ${ln("off + 4", 4)} % 2,
         |                  CAST(length(hexs)/2 AS BIGINT))
         |       ELSE off END AS off,
         |  CASE WHEN hdrl IS NOT NULL THEN hdrl
         |       WHEN $isHdrl THEN off + 8 END AS hdrl
         |  FROM $p${k - 1})""".stripMargin
    }.mkString(",\n")
    (s"""${p}0 AS (SELECT doc_id, hexs, CAST(12 AS BIGINT) AS off,
       |       CAST(NULL AS BIGINT) AS hdrl FROM $src),
       |$steps""".stripMargin, s"$p${Multimodal.WavMaxChunks}")
  }

  /** The full parseAviHeader validity over a walk end-state row. */
  private val aviOkSql: String =
    "substr(hexs, 1, 8) = '52494646' AND substr(hexs, 17, 8) = '41564920'" +
      "\n     AND length(hexs) >= 176 AND hdrl IS NOT NULL" +
      "\n     AND substr(hexs, 2*(hdrl + 4) + 1, 8) = '61766968'"

  val q102_sql: String = {
    val (walk, last) = aviWalkSql("m", "s")
    "WITH m AS (" + aviHexSql("") + "),\n" + walk + ",\n" +
      s"""p AS (SELECT doc_id, hexs, hdrl,
       |   $aviOkSql AS ok
       | FROM $last)
       |SELECT doc_id,
       |  CASE WHEN ok THEN 'avi' ELSE 'unknown' END AS format,
       |  CASE WHEN ok THEN ${ln("hdrl + 12 + 32", 4)} END AS width,
       |  CASE WHEN ok THEN ${ln("hdrl + 12 + 36", 4)} END AS height,
       |  CASE WHEN ok THEN ${ln("hdrl + 12 + 16", 4)} END AS n_frames,
       |  CASE WHEN ok THEN ${ln("hdrl + 12 + 24", 4)} END AS n_streams,
       |  CASE WHEN ok THEN ${ln("hdrl + 12", 4)} END AS micro_sec_per_frame,
       |  CASE WHEN ok THEN CAST(floor(${ln("hdrl + 12 + 16", 4)} * ${ln("hdrl + 12", 4)} / 1000) AS BIGINT) END AS duration_ms,
       |  CAST(length(hexs) / 2 AS BIGINT) AS payload_bytes
       |FROM p ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q114
  // Synthetic MP4 corpus (real ISO-BMFF box streams; an optional
  // variable-length 'free' box — including the size-8 empty box —
  // shifts the moov offset) decoded back via the top-level box walk +
  // mvhd v0 reads.
  val q114_container_meta: Q = (s, dir) => {
    val m = Multimodal.syntheticMp4(Tables.load(s, dir, "documents"))
    m.select(
      col("media_id").as("doc_id"),
      Multimodal.parseMp4Header(col("media")).as("m"),
      length(col("media")).cast("long").as("payload_bytes"))
      .select(col("doc_id"),
        col("m.format").as("format"),
        col("m.major_brand_hex").as("major_brand_hex"),
        col("m.timescale").as("timescale"),
        col("m.duration").as("duration"),
        col("m.duration_ms").as("duration_ms"),
        col("payload_bytes"))
      .orderBy("doc_id")
  }

  /** MP4 hex construction (same constants as syntheticMp4). */
  private def mp4HexSql(where: String): String = {
    val ts = "(CASE doc_id % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000" +
      " WHEN 2 THEN 90000 ELSE 44100 END)"
    val dur = "((doc_id % 7200 + 1) * 100)"
    val freeLen = "(doc_id % 9)"
    val mvhdTail = "00010000" + "0100" + "0000" + "0" * 16 +
      "000100000000000000000000" + "000000000001000000000000" +
      "000000000000000040000000" + "0" * 48 + "00000002"
    s"""SELECT doc_id, upper(CASE
       |    WHEN doc_id % 89 = 0 THEN md5(text)
       |    ELSE '000000106674797069736F6D00000000'
       |      || CASE WHEN doc_id % 2 = 0 THEN
       |           lpad(to_hex(8 + $freeLen), 8, '0') || '66726565'
       |           || substr(md5(text), 1, CAST(2 * $freeLen AS INT))
       |         ELSE '' END
       |      || '000000746D6F6F76'
       |      || '0000006C6D76686400000000' || lpad(to_hex(0), 8, '0')
       |      || lpad(to_hex(0), 8, '0')
       |      || lpad(to_hex($ts), 8, '0') || lpad(to_hex($dur), 8, '0')
       |      || '$mvhdTail'
       |  END) AS hexs FROM documents $where""".stripMargin
  }

  /** The ISO-BMFF top-level box walk over `src(doc_id, hexs)`. */
  private def mp4WalkSql(src: String, p: String): (String, String) = {
    val inBounds = s"off + 8 <= CAST(length(hexs)/2 AS BIGINT)"
    val open = s"moov IS NULL AND $inBounds AND ${bn("off", 4)} >= 8"
    val isMoov = s"$open AND substr(hexs, 2*off + 9, 8) = '6D6F6F76'"
    val steps = (1 to Multimodal.Mp4MaxBoxes).map { k =>
      s"""$p$k AS (SELECT doc_id, hexs,
         |  CASE WHEN $open AND NOT ($isMoov)
         |       THEN least(off + ${bn("off", 4)}, CAST(length(hexs)/2 AS BIGINT))
         |       ELSE off END AS off,
         |  CASE WHEN moov IS NOT NULL THEN moov
         |       WHEN $isMoov THEN off + 8 END AS moov
         |  FROM $p${k - 1})""".stripMargin
    }.mkString(",\n")
    (s"""${p}0 AS (SELECT doc_id, hexs, CAST(0 AS BIGINT) AS off,
       |              CAST(NULL AS BIGINT) AS moov FROM $src),
       |$steps""".stripMargin, s"$p${Multimodal.Mp4MaxBoxes}")
  }

  /** The full parseMp4Header validity over a walk end-state row. */
  private def mp4OkSql: String =
    s"""length(hexs) >= 32 AND substr(hexs, 9, 8) = '66747970'
       |     AND moov IS NOT NULL
       |     AND moov + 32 <= CAST(length(hexs)/2 AS BIGINT)
       |     AND substr(hexs, 2*(moov + 4) + 1, 8) = '6D766864'
       |     AND ${b1("moov + 8")} = 0 AND ${bn("moov + 20", 4)} > 0""".stripMargin

  val q114_sql: String = {
    val (walk, last) = mp4WalkSql("m", "s")
    "WITH m AS (" + mp4HexSql("") + "),\n" + walk + ",\n" +
      s"""p AS (SELECT doc_id, hexs, moov,
       |   $mp4OkSql AS ok
       | FROM $last)
       |SELECT doc_id,
       |  CASE WHEN ok THEN 'mp4' ELSE 'unknown' END AS format,
       |  CASE WHEN ok THEN substr(hexs, 17, 8) END AS major_brand_hex,
       |  CASE WHEN ok THEN ${bn("moov + 20", 4)} END AS timescale,
       |  CASE WHEN ok THEN ${bn("moov + 24", 4)} END AS duration,
       |  CASE WHEN ok THEN CAST(floor(${bn("moov + 24", 4)} * 1000
       |       / ${bn("moov + 20", 4)}) AS BIGINT) END AS duration_ms,
       |  CAST(length(hexs) / 2 AS BIGINT) AS payload_bytes
       |FROM p ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q167
  // REAL PCM sample-level decode: per-channel mean/RMS/peak computed as
  // one integer expression fold over the WAV data chunk. The DuckDB twin
  // replays the byte construction AND the sample loop (list_transform
  // over range — integer sums are order-independent, so the two engines
  // cannot disagree on accumulation order).
  val q167_wav_pcm_stats: Q = (s, dir) => {
    val m = Multimodal.syntheticWav(Tables.load(s, dir, "documents"))
    // three-step select: the chunk-walk struct materializes once, its
    // fields materialize once, THEN the sample fold runs over those
    // flat columns — splicing the walk into the fold would multiply
    // per-row cost (see parseWavHeader's finish-lambda note)
    m.select(
      col("media_id").as("doc_id"), col("media"),
      Multimodal.parseWavPcm(col("media")).as("p"))
      .select(col("doc_id"), col("media"),
        col("p.valid").as("valid"),
        col("p.channels").as("channels"),
        col("p.bits_per_sample").as("bits_per_sample"),
        col("p.n_frames").as("n_frames"),
        col("p.doff").as("doff"))
      .select(col("doc_id"),
        when(col("valid"), lit("wav")).otherwise(lit("unknown")).as("format"),
        col("channels"), col("bits_per_sample"), col("n_frames"),
        when(col("valid"), Multimodal.pcmChannelStats(col("media"),
          col("doff"), col("channels"), col("bits_per_sample"),
          col("n_frames"))).as("st"))
      .select(col("doc_id"), col("format"), col("channels"),
        col("bits_per_sample"), col("n_frames"),
        col("st.sum_ch0").as("sum_ch0"), col("st.sum_ch1").as("sum_ch1"),
        col("st.peak_ch0").as("peak_ch0"), col("st.peak_ch1").as("peak_ch1"),
        col("st.mean_ch0").as("mean_ch0"), col("st.mean_ch1").as("mean_ch1"),
        col("st.rms_ch0").as("rms_ch0"), col("st.rms_ch1").as("rms_ch1"))
      .orderBy("doc_id")
  }

  // sample i (0-based), bps bytes/sample: signed PCM value in hex space
  // — shared by the q167 stats fold and the q177 fingerprint fold
  private def wavSampleV(i: String) = {
    val o = s"(doff + ($i) * bps)"
    val v8 = s"(CAST('0x' || substr(hexs, 2*$o + 1, 2) AS BIGINT) - 128)"
    val raw16 = s"CAST('0x' || substr(hexs, 2*($o + 1) + 1, 2)" +
      s" || substr(hexs, 2*$o + 1, 2) AS BIGINT)"
    val v16 = s"($raw16 - CASE WHEN $raw16 >= 32768 THEN 65536 ELSE 0 END)"
    s"(CASE WHEN bps = 1 THEN $v8 ELSE $v16 END)"
  }

  // nfx/chx are zeroed for invalid rows (guard CTE in wavPcmCtes), so
  // the per-row sample loop is range(0) = empty wherever the header
  // walk failed — garbage header bytes can never size a loop
  private def wavChSum(ch: Int, sq: Boolean) = {
    val v = wavSampleV("i")
    val term = if (sq) s"$v * $v" else v
    s"CAST(list_sum(list_transform(range(nfx * chx), i -> " +
      s"CASE WHEN i % chx = $ch THEN $term ELSE 0 END)) AS BIGINT)"
  }

  private def wavChPeak(ch: Int) =
    s"CAST(list_max(list_transform(range(nfx * chx), i -> " +
      s"CASE WHEN i % chx = $ch THEN abs(${wavSampleV("i")}) ELSE -1 END)) AS BIGINT)"

  /** Shared DuckDB CTE chain: documents → synthetic WAV hex stream →
    * chunk walk → validated decode params, ending in `v2` with
    * (doc_id, hexs, doff, ch, bits, nf, bps, ok, nfx, chx). q167 folds
    * channel stats over it; q177 folds the perceptual fingerprint. */
  private def wavPcmCtes: String = {
    val inBounds = "off + 8 <= CAST(length(hexs)/2 AS BIGINT)"
    val open = s"(fmt IS NULL OR doff IS NULL) AND $inBounds"
    val steps = (1 to Multimodal.WavMaxChunks).map { k =>
      s"""s$k AS (SELECT doc_id, hexs,
         |  CASE WHEN $open
         |       THEN off + 8 + ${ln("off + 4", 4)} + ${ln("off + 4", 4)} % 2
         |       ELSE off END AS off,
         |  CASE WHEN fmt IS NOT NULL THEN fmt
         |       WHEN $open AND substr(hexs, 2*off + 1, 8) = '666D7420'
         |       THEN off + 8 END AS fmt,
         |  CASE WHEN doff IS NOT NULL THEN doff
         |       WHEN $open AND substr(hexs, 2*off + 1, 8) = '64617461'
         |       THEN off + 8 END AS doff,
         |  CASE WHEN dsize IS NOT NULL THEN dsize
         |       WHEN $open AND substr(hexs, 2*off + 1, 8) = '64617461'
         |       THEN ${ln("off + 4", 4)} END AS dsize
         |  FROM s${k - 1})""".stripMargin
    }.mkString(",\n")
    val nCh = "(1 + doc_id % 2)"
    val sr = "(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END)"
    val bps = "(CASE WHEN doc_id % 5 < 2 THEN 1 ELSE 2 END)"
    val dataLen = "(doc_id % 9 + 8)"
    val listLen = "(doc_id % 7 + 1)"
    s"""m AS (SELECT doc_id, upper(CASE
       |    WHEN doc_id % 89 = 0 THEN md5(text)
       |    ELSE '52494646'
       |      || ${lew(s"4 + CASE WHEN doc_id % 2 = 0 THEN 12 + $listLen + $listLen % 2 ELSE 0 END + 32 + $dataLen", 4)}
       |      || '57415645'
       |      || CASE WHEN doc_id % 2 = 0 THEN
       |           '4C495354' || ${lew(s"$listLen + 4", 4)} || '494E464F'
       |           || substr(md5(text), 1, CAST(2 * $listLen AS INT))
       |           || CASE WHEN $listLen % 2 = 1 THEN '00' ELSE '' END
       |         ELSE '' END
       |      || '666D7420' || ${lew("16", 4)} || ${lew("1", 2)}
       |      || ${lew(nCh, 2)} || ${lew(sr, 4)} || ${lew(s"$sr * $nCh * $bps", 4)}
       |      || ${lew(s"$nCh * $bps", 2)} || ${lew(s"8 * $bps", 2)}
       |      || '64617461' || ${lew(dataLen, 4)}
       |      || substr(md5(text), 1, CAST(2 * $dataLen AS INT))
       |  END) AS hexs FROM documents),
       |s0 AS (SELECT doc_id, hexs, CAST(12 AS BIGINT) AS off,
       |       CAST(NULL AS BIGINT) AS fmt, CAST(NULL AS BIGINT) AS doff,
       |       CAST(NULL AS BIGINT) AS dsize FROM m),
       |$steps,
       |p AS (SELECT doc_id, hexs, fmt, doff, dsize,
       |   ${ln("fmt", 2)} AS codec, ${ln("fmt + 2", 2)} AS ch,
       |   ${ln("fmt + 14", 2)} AS bits, ${ln("fmt + 12", 2)} AS ba,
       |   CAST(floor(dsize / ${ln("fmt + 12", 2)}) AS BIGINT) AS nf,
       |   substr(hexs, 1, 8) = '52494646' AND substr(hexs, 17, 8) = '57415645'
       |     AND length(hexs) >= 88 AND fmt IS NOT NULL AND doff IS NOT NULL
       |     AND dsize IS NOT NULL AS riff_ok
       | FROM s${Multimodal.WavMaxChunks}),
       |v AS (SELECT doc_id, hexs, doff, ch, bits, nf,
       |   CASE WHEN bits = 8 THEN 1 ELSE 2 END AS bps,
       |   riff_ok AND codec = 1 AND bits IN (8, 16) AND ch BETWEEN 1 AND 2
       |     AND ba = ch * (bits // 8)
       |     AND doff + dsize <= CAST(length(hexs)/2 AS BIGINT)
       |     AND nf > 0 AS ok
       | FROM p),
       |v2 AS MATERIALIZED (SELECT *, CASE WHEN ok THEN nf ELSE 0 END AS nfx,
       |       CASE WHEN ok THEN ch ELSE 1 END AS chx FROM v)""".stripMargin
  }
  // ^ MATERIALIZED: a downstream WHERE ok (q177) otherwise makes DuckDB
  // push the predicate through the four chunk-walk CTEs, duplicating the
  // walk expressions combinatorially — the planner never returns.

  // NOTE: wavPcmCtes is already margin-stripped and contains `||`
  // string concatenations at line starts — interpolating it into
  // another stripMargin template would eat one pipe of every `||`.
  // Always CONCATENATE it, never re-strip over it.
  val q167_sql: String = "WITH " + wavPcmCtes + "\n" +
    s"""SELECT doc_id,
       |  CASE WHEN ok THEN 'wav' ELSE 'unknown' END AS format,
       |  CASE WHEN ok THEN ch END AS channels,
       |  CASE WHEN ok THEN bits END AS bits_per_sample,
       |  CASE WHEN ok THEN nf END AS n_frames,
       |  CASE WHEN ok THEN ${wavChSum(0, sq = false)} END AS sum_ch0,
       |  CASE WHEN ok AND ch = 2 THEN ${wavChSum(1, sq = false)} END AS sum_ch1,
       |  CASE WHEN ok THEN ${wavChPeak(0)} END AS peak_ch0,
       |  CASE WHEN ok AND ch = 2 THEN ${wavChPeak(1)} END AS peak_ch1,
       |  CASE WHEN ok THEN round(${wavChSum(0, sq = false)} / nf, 6) END AS mean_ch0,
       |  CASE WHEN ok AND ch = 2 THEN round(${wavChSum(1, sq = false)} / nf, 6) END AS mean_ch1,
       |  CASE WHEN ok THEN round(sqrt(${wavChSum(0, sq = true)} / nf), 6) END AS rms_ch0,
       |  CASE WHEN ok AND ch = 2 THEN round(sqrt(${wavChSum(1, sq = true)} / nf), 6) END AS rms_ch1
       |FROM v2 ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q168
  // REAL BMP pixel-level decode: per-channel (B, G, R) mean/variance as
  // one integer expression fold over the pixel array. The variable
  // header-to-pixel gap forces reading the data offset; widths 1-4 give
  // strides with 0-3 pad bytes per row that must be skipped.
  val q168_bmp_pixel_stats: Q = (s, dir) => {
    val m = Multimodal.syntheticBmp(Tables.load(s, dir, "documents"))
    m.select(
      col("media_id").as("doc_id"), col("media"),
      Multimodal.parseBmp(col("media")).as("p"))
      .select(col("doc_id"), col("media"),
        col("p.valid").as("valid"),
        col("p.width").as("width"),
        col("p.height").as("height"),
        col("p.data_off").as("data_off"))
      .select(col("doc_id"),
        when(col("valid"), lit("bmp")).otherwise(lit("unknown")).as("format"),
        col("width"), col("height"),
        when(col("valid"), col("width") * col("height")).as("n_pixels"),
        when(col("valid"), Multimodal.bmpChannelStats(col("media"),
          col("data_off"), col("width"), col("height"))).as("st"))
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("n_pixels"),
        col("st.sum_b").as("sum_b"), col("st.sum_g").as("sum_g"),
        col("st.sum_r").as("sum_r"),
        col("st.mean_b").as("mean_b"), col("st.mean_g").as("mean_g"),
        col("st.mean_r").as("mean_r"),
        col("st.var_b").as("var_b"), col("st.var_g").as("var_g"),
        col("st.var_r").as("var_r"))
      .orderBy("doc_id")
  }

  /** Cap for the perceptual PAIR-LIST demo (q195): the synthetic
    * corpus renders only 12 (w, h) shapes over a ≤ 2^12-value hash
    * space, so Hamming-ball collision groups fatten with n and the
    * pair ANSWER grows super-linearly (measured a(10×) = 1.26, 789 MB
    * shuffled, 972 MB spill under a 2 GiB driver at sf1) — a real
    * 64-bit aHash keeps groups near-constant, but as benched the
    * uncapped demo was the inventory's one super-linear entry. Same
    * discipline as TextSim.PairDocCap: the pair-list output is a demo
    * window, and q210's canonical assignment (group representatives →
    * n-row output) is the UNCAPPED scale path. Logged on every use —
    * never silent. */
  private val MediaPairCap = 500

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Shared DuckDB CTE chain: documents → synthetic BMP hex stream →
    * validated decode params, ending in `v2` with (doc_id, hexs, wx,
    * hh, doffx, stride, rb, np, ok, rbx, hhx). q168 folds channel
    * stats over it; q195 folds the average hash. `where` filters the
    * source corpus (the q195 pair-demo cap); empty = full corpus. */
  private def bmpCtes: String = bmpCtesWhere("")

  /** BMP hex construction (same constants as syntheticBmp) as two
    * chained CTEs named `${mName}`/`${cName}`; `cName` ends with
    * (doc_id, hexs). */
  private def bmpHexCtes(mName: String, cName: String, where: String): String = {
    val w = "(1 + doc_id % 4)"
    val h = "(1 + doc_id % 3)"
    val gap = "(doc_id % 5)"
    s"""$mName AS (SELECT doc_id,
       |    upper(md5(text) || md5(text || 'a') || md5(text || 'b')) AS body,
       |    $w AS w, $h AS h, $gap AS gap,
       |    ((3 * $w + 3) // 4) * 4 AS stride FROM documents $where),
       |$cName AS (SELECT doc_id, upper(CASE
       |    WHEN doc_id % 97 = 0 THEN body
       |    ELSE '424D' || ${lew("54 + gap + stride * h", 4)}
       |      || ${lew("0", 4)} || ${lew("54 + gap", 4)}
       |      || ${lew("40", 4)} || ${lew("w", 4)} || ${lew("h", 4)}
       |      || ${lew("1", 2)} || ${lew("24", 2)} || ${lew("0", 4)}
       |      || ${lew("stride * h", 4)} || ${lew("2835", 4)} || ${lew("2835", 4)}
       |      || ${lew("0", 4)} || ${lew("0", 4)}
       |      || substr(body, 1, CAST(2 * gap AS INT))
       |      || substr(body, CAST(2 * gap + 1 AS INT), CAST(2 * stride * h AS INT))
       |  END) AS hexs FROM $mName)""".stripMargin
  }

  private def bmpCtesWhere(where: String): String = {
    bmpHexCtes("m", "c", where) + ",\n" +
      s"""p0 AS (SELECT doc_id, hexs,
       |   least(${ln("18", 4)}, ${2 * Multimodal.BmpMaxPixels}) AS wx,
       |   least(${ln("22", 4)}, ${2 * Multimodal.BmpMaxPixels}) AS hh,
       |   ${ln("10", 4)} AS doffx,
       |   length(hexs) >= 108 AND substr(hexs, 1, 4) = '424D'
       |     AND ${ln("14", 4)} = 40 AND ${ln("26", 2)} = 1
       |     AND ${ln("28", 2)} = 24 AND ${ln("30", 4)} = 0 AS is_bmp
       | FROM c),
       |p AS (SELECT *, ((3 * wx + 3) // 4) * 4 AS stride, 3 * wx AS rb
       | FROM p0),
       |v AS (SELECT doc_id, hexs, wx, hh, doffx, stride, rb,
       |   CAST(wx * hh AS DOUBLE) AS np,
       |   is_bmp AND wx > 0 AND hh > 0 AND wx * hh <= ${Multimodal.BmpMaxPixels}
       |     AND doffx >= 54
       |     AND doffx + stride * hh <= CAST(length(hexs)/2 AS BIGINT) AS ok
       | FROM p),
       |v2 AS (SELECT *, CASE WHEN ok THEN rb ELSE 0 END AS rbx,
       |       CASE WHEN ok THEN hh ELSE 0 END AS hhx FROM v)""".stripMargin
  }

  // --------------------------------------------------------------- q217
  // Mixed-corpus media-validity census: a six-slice corpus (BMP, WAV,
  // AVI, MP4 by doc_id % 6, PNG/JPEG/unknown on the rest) run through
  // `Multimodal.mediaValidityCensus` — per slice, how many payloads
  // each parser's FULL structural gates claim (not just magic sniffs:
  // the WAV claim replays the fmt+data chunk walk, AVI the LIST/hdrl
  // walk, MP4 the box walk, BMP the header/bounds checks) and how many
  // nothing claims. The deliberate headerless branches (doc_id % 97 /
  // 89 / 83) land in n_unknown, so the census quantifies exactly what
  // the decode family excludes — q213's discipline for binary columns,
  // hash-checked end to end. The oracle replays all five byte
  // constructions AND all three chunk walks over the mixed table.
  val q217_media_census: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    def slice(r: Int) = docs.filter(col("doc_id") % 6 === r)
    val mixed = Multimodal.syntheticBmp(slice(0))
      .unionByName(Multimodal.syntheticWav(slice(1)))
      .unionByName(Multimodal.syntheticAvi(slice(2)))
      .unionByName(Multimodal.syntheticMp4(slice(3)))
      .unionByName(Multimodal.syntheticMedia(docs.filter(col("doc_id") % 6 >= 4)))
    Multimodal.mediaValidityCensus(mixed, col("media_id") % 6, col("media"))
  }

  // --------------------------------------------------------------- q224
  // Oracle-checked REAL PNG decode: the synthetic corpus carries
  // complete zlib streams (STORED final blocks + exact Adler-32) whose
  // pixels are pure id arithmetic, so the Spark side must run the
  // actual Inflater + three-filter-type reconstruction
  // (graft.expressions.PngDecode) while DuckDB recomputes the expected
  // per-channel sums straight from the pixel formula — it never sees
  // the bytes. A hash match proves the decoder inverts the encoder
  // exactly: chunk walk, zlib stored-block framing, None/Sub/Up
  // de-filtering, channel layout, and the fused integer stats. The
  // four constructed defect variants (id mod 7 = 1..4) must land in
  // their census buckets with the header fields still surfaced.
  val q224_png_decode: Q = (s, dir) => {
    val m = Multimodal.syntheticPngDecodable(Tables.load(s, dir, "documents"))
    val parsed = m.select(col("media_id").as("doc_id"),
      Multimodal.pngDecode(col("media")).as("d"))
    parsed.select(col("doc_id"),
      col("d.valid").as("valid"), col("d.reason").as("reason"),
      col("d.width").as("width"), col("d.height").as("height"),
      col("d.n_px").as("n_px"),
      element_at(col("d.chan_sum"), 1).as("s0"),
      element_at(col("d.chan_sum"), 2).as("s1"),
      element_at(col("d.chan_sum"), 3).as("s2"),
      element_at(col("d.chan_sqsum"), 1).as("q0"),
      element_at(col("d.chan_sqsum"), 2).as("q1"),
      element_at(col("d.chan_sqsum"), 3).as("q2"))
      .orderBy("doc_id")
  }

  val q224_sql: String =
    """WITH v AS (SELECT doc_id, doc_id % 7 AS var FROM documents),
      |px AS (
      |  SELECT doc_id, (doc_id * 31 + t.j * t.j * 7 + t.j * 13) % 256 AS p,
      |         (t.j % 15) % 3 AS c
      |  FROM v, generate_series(0, 44) AS t(j)
      |  WHERE var IN (0, 5, 6)),
      |st AS (SELECT doc_id,
      |    CAST(sum(p) FILTER (WHERE c = 0) AS BIGINT) AS s0,
      |    CAST(sum(p) FILTER (WHERE c = 1) AS BIGINT) AS s1,
      |    CAST(sum(p) FILTER (WHERE c = 2) AS BIGINT) AS s2,
      |    CAST(sum(p * p) FILTER (WHERE c = 0) AS BIGINT) AS q0,
      |    CAST(sum(p * p) FILTER (WHERE c = 1) AS BIGINT) AS q1,
      |    CAST(sum(p * p) FILTER (WHERE c = 2) AS BIGINT) AS q2
      |  FROM px GROUP BY 1)
      |SELECT d.doc_id, d.var IN (0, 5, 6) AS valid,
      |  CASE d.var WHEN 1 THEN 'interlaced' WHEN 2 THEN 'trunc_idat'
      |             WHEN 3 THEN 'unsupported_depth' WHEN 4 THEN 'palette'
      |  END AS reason,
      |  5 AS width, 3 AS height, CAST(15 AS BIGINT) AS n_px,
      |  st.s0, st.s1, st.s2, st.q0, st.q1, st.q2
      |FROM v d LEFT JOIN st USING (doc_id) ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q226
  // Oracle-checked REAL G.711 audio decode — q224's discipline for the
  // audio half of the former codec stub: the synthetic WAVs carry
  // µ-law / A-law payloads whose bytes are pure id arithmetic, so the
  // Spark side must run the actual ITU-T G.711 segment expansion
  // (graft.expressions.AudioDecode — the same arithmetic javax.sound's
  // codec produces, pinned byte-for-byte in AudioDecodeSpec) while
  // DuckDB re-derives each byte AND replays the expansion in ~6 integer
  // ops to recompute per-channel sum / sum-of-squares / peak. A hash
  // match proves the chunk walk, both companding laws, the stereo
  // interleave, and the fused integer stats. The truncated-data and
  // MPEG-tag variants must land in their census buckets with header
  // fields surfaced.
  val q226_g711_decode: Q = (s, dir) => {
    val m = Multimodal.syntheticG711Wav(Tables.load(s, dir, "documents"))
    val parsed = m.select(col("media_id").as("doc_id"),
      Multimodal.audioDecode(col("media")).as("d"))
    parsed.select(col("doc_id"),
      col("d.valid").as("valid"), col("d.reason").as("reason"),
      col("d.codec").as("codec"), col("d.channels").as("channels"),
      col("d.n_frames").as("n_frames"),
      element_at(col("d.chan_sum"), 1).as("s0"),
      when(col("d.channels") >= 2, element_at(col("d.chan_sum"), 2)).as("s1"),
      element_at(col("d.chan_sqsum"), 1).as("q0"),
      when(col("d.channels") >= 2, element_at(col("d.chan_sqsum"), 2)).as("q1"),
      element_at(col("d.chan_peak"), 1).as("p0"),
      when(col("d.channels") >= 2, element_at(col("d.chan_peak"), 2)).as("p1"))
      .orderBy("doc_id")
  }

  val q226_sql: String =
    """WITH v AS (SELECT doc_id, doc_id % 5 AS var FROM documents),
      |b AS (
      |  SELECT doc_id, var, t.j,
      |    CAST((doc_id * 31 + t.j * t.j * 7 + t.j * 13) % 256 AS INT) AS byt,
      |    CASE WHEN var = 2 THEN t.j % 2 ELSE 0 END AS c
      |  FROM v, generate_series(0, 39) AS t(j)
      |  WHERE var IN (0, 1, 2)),
      |d AS (
      |  SELECT doc_id, var, c,
      |    CASE WHEN var IN (0, 2) THEN
      |      -- ITU-T G.711 mu-law expansion (Sun ulaw2linear arithmetic)
      |      CASE WHEN (255 - byt) >= 128
      |        THEN 132 - ((((255 - byt) % 16) * 8 + 132)
      |                    * (1 << (((255 - byt) // 16) % 8)))
      |        ELSE ((((255 - byt) % 16) * 8 + 132)
      |              * (1 << (((255 - byt) // 16) % 8))) - 132 END
      |    ELSE
      |      -- ITU-T G.711 A-law expansion (Sun alaw2linear arithmetic)
      |      CASE WHEN xor(byt, 85) >= 128 THEN 1 ELSE -1 END *
      |      CASE (xor(byt, 85) // 16) % 8
      |        WHEN 0 THEN (xor(byt, 85) % 16) * 16 + 8
      |        WHEN 1 THEN (xor(byt, 85) % 16) * 16 + 264
      |        ELSE ((xor(byt, 85) % 16) * 16 + 264)
      |             * (1 << ((xor(byt, 85) // 16) % 8 - 1)) END
      |    END AS smp
      |  FROM b),
      |st AS (SELECT doc_id,
      |    CAST(sum(smp) FILTER (WHERE c = 0) AS BIGINT) AS s0,
      |    CAST(sum(smp) FILTER (WHERE c = 1) AS BIGINT) AS s1,
      |    CAST(sum(smp * smp) FILTER (WHERE c = 0) AS BIGINT) AS q0,
      |    CAST(sum(smp * smp) FILTER (WHERE c = 1) AS BIGINT) AS q1,
      |    CAST(max(abs(smp)) FILTER (WHERE c = 0) AS BIGINT) AS p0,
      |    CAST(max(abs(smp)) FILTER (WHERE c = 1) AS BIGINT) AS p1
      |  FROM d GROUP BY 1)
      |SELECT x.doc_id, x.var IN (0, 1, 2) AS valid,
      |  CASE x.var WHEN 3 THEN 'trunc_data'
      |             WHEN 4 THEN 'unsupported_codec' END AS reason,
      |  CASE x.var WHEN 0 THEN 'ulaw' WHEN 2 THEN 'ulaw' WHEN 1 THEN 'alaw'
      |             WHEN 4 THEN 'tag_85' END AS codec,
      |  CAST(CASE WHEN x.var = 2 THEN 2 ELSE 1 END AS INT) AS channels,
      |  CAST(CASE x.var WHEN 2 THEN 20 WHEN 0 THEN 40 WHEN 1 THEN 40
      |       END AS BIGINT) AS n_frames,
      |  st.s0, st.s1, st.q0, st.q1, st.p0, st.p1
      |FROM v x LEFT JOIN st USING (doc_id) ORDER BY x.doc_id""".stripMargin

  // --------------------------------------------------------------- q229
  // AIFF/AU container-walk oracle — q226's sibling for the OTHER two
  // audio containers: the synthetic corpus carries big-endian PCM16
  // AIFF (incl. a real 80-bit IEEE-extended sample-rate field the
  // decoder must parse), µ-law-in-AU, and stereo BE-PCM-in-AU, all
  // from id arithmetic, so DuckDB recomputes per-channel stats from
  // the sample formulas while Spark walks the real containers. The
  // truncated-SSND and unknown-encoding variants must census. With
  // this, every audio container this library claims is hash-checked;
  // only ADPCM's sequential state machine stays spec-pinned.
  val q229_au_aiff_decode: Q = (s, dir) => {
    val m = Multimodal.syntheticAudioContainers(Tables.load(s, dir, "documents"))
    val parsed = m.select(col("media_id").as("doc_id"),
      Multimodal.audioDecode(col("media")).as("d"))
    parsed.select(col("doc_id"),
      col("d.valid").as("valid"), col("d.reason").as("reason"),
      col("d.container").as("container"), col("d.codec").as("codec"),
      col("d.channels").as("channels"),
      // the 80-bit IEEE-extended COMM rate (AIFF) and the AU header
      // rate, oracle-covered since round 11; only-valid so the census
      // rows stay independent of which parse step failed
      when(col("d.valid"), col("d.sample_rate")).as("sample_rate"),
      col("d.n_frames").as("n_frames"),
      element_at(col("d.chan_sum"), 1).as("s0"),
      when(col("d.channels") >= 2, element_at(col("d.chan_sum"), 2)).as("s1"),
      element_at(col("d.chan_sqsum"), 1).as("q0"),
      when(col("d.channels") >= 2, element_at(col("d.chan_sqsum"), 2)).as("q1"),
      element_at(col("d.chan_peak"), 1).as("p0"),
      when(col("d.channels") >= 2, element_at(col("d.chan_peak"), 2)).as("p1"))
      .orderBy("doc_id")
  }

  val q229_sql: String =
    """WITH v AS (SELECT doc_id, doc_id % 5 AS var FROM documents),
      |b AS (
      |  SELECT doc_id, var, t.j,
      |    CASE WHEN var IN (0, 2) THEN
      |      -- 16-bit two's-complement wire value, signed
      |      CASE WHEN (doc_id * 37 + t.j * t.j * 11 + t.j * 17) % 65536 >= 32768
      |        THEN (doc_id * 37 + t.j * t.j * 11 + t.j * 17) % 65536 - 65536
      |        ELSE (doc_id * 37 + t.j * t.j * 11 + t.j * 17) % 65536 END
      |    ELSE
      |      -- G.711 mu-law expansion of the q226 byte formula
      |      CASE WHEN (255 - (doc_id * 31 + t.j * t.j * 7 + t.j * 13) % 256) >= 128
      |        THEN 132 - ((((255 - (doc_id * 31 + t.j * t.j * 7 + t.j * 13) % 256) % 16) * 8 + 132)
      |             * (1 << (((255 - (doc_id * 31 + t.j * t.j * 7 + t.j * 13) % 256) // 16) % 8)))
      |        ELSE ((((255 - (doc_id * 31 + t.j * t.j * 7 + t.j * 13) % 256) % 16) * 8 + 132)
      |             * (1 << (((255 - (doc_id * 31 + t.j * t.j * 7 + t.j * 13) % 256) // 16) % 8))) - 132 END
      |    END AS smp,
      |    CASE WHEN var = 2 THEN t.j % 2 ELSE 0 END AS c
      |  FROM v, generate_series(0, 19) AS t(j)
      |  WHERE var IN (0, 1, 2)),
      |st AS (SELECT doc_id,
      |    CAST(sum(smp) FILTER (WHERE c = 0) AS BIGINT) AS s0,
      |    CAST(sum(smp) FILTER (WHERE c = 1) AS BIGINT) AS s1,
      |    CAST(sum(smp * smp) FILTER (WHERE c = 0) AS BIGINT) AS q0,
      |    CAST(sum(smp * smp) FILTER (WHERE c = 1) AS BIGINT) AS q1,
      |    CAST(max(abs(smp)) FILTER (WHERE c = 0) AS BIGINT) AS p0,
      |    CAST(max(abs(smp)) FILTER (WHERE c = 1) AS BIGINT) AS p1
      |  FROM b GROUP BY 1)
      |SELECT x.doc_id, x.var IN (0, 1, 2) AS valid,
      |  CASE x.var WHEN 3 THEN 'trunc_data'
      |             WHEN 4 THEN 'unsupported_codec' END AS reason,
      |  CASE WHEN x.var IN (0, 3) THEN 'aiff' ELSE 'au' END AS container,
      |  CASE x.var WHEN 0 THEN 'pcm' WHEN 2 THEN 'pcm' WHEN 3 THEN 'pcm'
      |             WHEN 1 THEN 'ulaw' WHEN 4 THEN 'enc_7' END AS codec,
      |  CAST(CASE WHEN x.var = 2 THEN 2 ELSE 1 END AS INT) AS channels,
      |  CAST(CASE WHEN x.var IN (0, 1, 2) THEN 8000 END AS INT) AS sample_rate,
      |  CAST(CASE x.var WHEN 0 THEN 20 WHEN 1 THEN 20 WHEN 2 THEN 10
      |       END AS BIGINT) AS n_frames,
      |  st.s0, st.s1, st.q0, st.q1, st.p0, st.p1
      |FROM v x LEFT JOIN st USING (doc_id) ORDER BY x.doc_id""".stripMargin

  // --------------------------------------------------------------- q230
  // IMA-ADPCM state-machine oracle — the one audio codec q226/q229
  // left spec-pinned, on the grounds that its SEQUENTIAL recurrence
  // over (predictor, step index) isn't set-expressible. It is,
  // however, RECURSION-expressible: the corpus is one mono block of 17
  // samples per doc, so a DuckDB recursive CTE walks the exact IMA
  // recurrence (89-entry step table, nibble magnitude reconstruction,
  // both clamps) in 17 steps per doc while Spark runs the real block
  // decoder. A hash match proves the step/index tables, the clamp
  // order, the header-predictor-is-sample-0 convention, and the
  // low-nibble-first packing. The geometry-defect variant (declared
  // samples-per-block inconsistent with blockAlign) must census.
  val q230_adpcm_decode: Q = (s, dir) => {
    val m = Multimodal.syntheticAdpcmWav(Tables.load(s, dir, "documents"))
    val parsed = m.select(col("media_id").as("doc_id"),
      Multimodal.audioDecode(col("media")).as("d"))
    parsed.select(col("doc_id"),
      col("d.valid").as("valid"), col("d.reason").as("reason"),
      col("d.codec").as("codec"), col("d.channels").as("channels"),
      col("d.n_frames").as("n_frames"),
      element_at(col("d.chan_sum"), 1).as("s0"),
      element_at(col("d.chan_sqsum"), 1).as("q0"),
      element_at(col("d.chan_peak"), 1).as("p0"))
      .orderBy("doc_id")
  }

  val q230_sql: String = {
    val steps = "[7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, " +
      "28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, " +
      "130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, " +
      "449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, " +
      "1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, " +
      "4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, " +
      "11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, " +
      "27086, 29794, 32767]"
    val idxTab = "[-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]"
    // nibble for the step from sample s to s+1 (the builder's formula)
    val nb = "((r.doc_id * 7 + r.s * r.s * 3 + r.s * 5) % 16)"
    val st = s"($steps)[r.idx + 1]"
    val diff = s"($st // 8" +
      s" + CASE WHEN $nb % 2 = 1 THEN $st // 4 ELSE 0 END" +
      s" + CASE WHEN ($nb // 2) % 2 = 1 THEN $st // 2 ELSE 0 END" +
      s" + CASE WHEN ($nb // 4) % 2 = 1 THEN $st ELSE 0 END)"
    s"""WITH RECURSIVE v AS (SELECT doc_id, doc_id % 4 AS var FROM documents),
       |p AS (SELECT doc_id, CAST((doc_id % 1024) - 512 AS BIGINT) AS pred0,
       |        CAST(doc_id % 89 AS BIGINT) AS idx0
       |      FROM v WHERE var < 3),
       |rec AS (
       |  SELECT doc_id, 0 AS s, pred0 AS pred, idx0 AS idx FROM p
       |  UNION ALL
       |  SELECT r.doc_id, r.s + 1,
       |    CASE WHEN $nb >= 8
       |      THEN greatest(-32768, r.pred - $diff)
       |      ELSE least(32767, r.pred + $diff) END,
       |    least(88, greatest(0, r.idx + ($idxTab)[$nb + 1]))
       |  FROM rec r WHERE r.s < 16),
       |st2 AS (SELECT doc_id,
       |    CAST(sum(pred) AS BIGINT) AS s0,
       |    CAST(sum(pred * pred) AS BIGINT) AS q0,
       |    CAST(max(abs(pred)) AS BIGINT) AS p0
       |  FROM rec GROUP BY 1)
       |SELECT x.doc_id, x.var < 3 AS valid,
       |  CASE WHEN x.var = 3 THEN 'bad_fmt' END AS reason,
       |  'ima_adpcm' AS codec, CAST(1 AS INT) AS channels,
       |  CAST(CASE WHEN x.var < 3 THEN 17 END AS BIGINT) AS n_frames,
       |  st2.s0, st2.q0, st2.p0
       |FROM v x LEFT JOIN st2 USING (doc_id) ORDER BY x.doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q232
  // MPEG-audio frame-header walk oracle (the q229 pattern applied to
  // MP3 metadata): synthetic MPEG1/MPEG2 Layer I/III streams whose
  // headers are pure id arithmetic, so DuckDB recomputes the expected
  // walk — frame lengths from the published bitrate/samplerate tables
  // and the public length arithmetic, CBR duration in exact integer
  // ms, Xing VBR frame counts, ID3v2 skip geometry — while Spark runs
  // the real MpegProbe expression. The truncated-frame and
  // reserved-samplerate variants must census with the walked prefix
  // surfaced. With this, the labeled codec stub narrows to MP3/AAC
  // SAMPLE reconstruction: every byte of MPEG-audio METADATA this
  // library claims is hash-checked.
  val q232_mpeg_walk: Q = (s, dir) => {
    val m = Multimodal.syntheticMpeg(Tables.load(s, dir, "documents"))
    val parsed = m.select(col("media_id").as("doc_id"),
      Multimodal.mpegProbe(col("media")).as("d"))
    parsed.select(col("doc_id"),
      col("d.valid").as("valid"), col("d.reason").as("reason"),
      col("d.version").as("version"), col("d.layer").as("layer"),
      col("d.bitrate_kbps").as("bitrate_kbps"),
      col("d.sample_rate").as("sample_rate"),
      col("d.channels").as("channels"), col("d.cbr").as("cbr"),
      col("d.n_frames").as("n_frames"),
      col("d.frame_bytes").as("frame_bytes"),
      col("d.duration_ms").as("duration_ms"),
      col("d.vbr_tag").as("vbr_tag"),
      col("d.vbr_frames").as("vbr_frames"),
      col("d.trailing_bytes").as("trailing_bytes"))
      .orderBy("doc_id")
  }

  val q232_sql: String =
    """WITH v AS (SELECT doc_id, doc_id % 7 AS var,
      |    1 + doc_id % 14 AS bri, doc_id % 3 AS sri, doc_id % 2 AS odd
      |  FROM documents),
      |c AS (SELECT doc_id, var, odd,
      |    CASE WHEN var IN (0, 3, 4) THEN
      |           [32,40,48,56,64,80,96,112,128,160,192,224,256,320][bri]
      |         WHEN var = 1 THEN
      |           [8,16,24,32,40,48,56,64,80,96,112,128,144,160][bri]
      |         WHEN var = 2 THEN 160
      |         WHEN var = 5 THEN
      |           [32,64,96,128,160,192,224,256,288,320,352,384,416,448][bri]
      |    END AS kbps,
      |    CASE WHEN var = 1 THEN [22050,24000,16000][sri + 1]
      |         WHEN var = 2 THEN 44100
      |         WHEN var = 6 THEN NULL
      |         ELSE [44100,48000,32000][sri + 1] END AS sr
      |  FROM v),
      |d AS (SELECT doc_id, var, kbps, sr, odd,
      |    CASE WHEN var IN (0, 3, 4) THEN kbps * 144000 // sr
      |         WHEN var = 1 THEN kbps * 72000 // sr
      |         WHEN var = 2 THEN 522
      |         WHEN var = 5 THEN (kbps * 12000 // sr) * 4 END AS flen
      |  FROM c)
      |SELECT doc_id, var IN (0, 1, 2, 3, 5) AS valid,
      |  CASE var WHEN 4 THEN 'trunc_frame' WHEN 6 THEN 'bad_header'
      |    END AS reason,
      |  CASE WHEN var = 6 THEN NULL WHEN var = 1 THEN '2' ELSE '1'
      |    END AS version,
      |  CAST(CASE WHEN var = 6 THEN NULL WHEN var = 5 THEN 1 ELSE 3
      |    END AS INT) AS layer,
      |  CAST(kbps AS INT) AS bitrate_kbps,
      |  CAST(sr AS INT) AS sample_rate,
      |  CAST(CASE WHEN var = 6 THEN NULL WHEN var IN (1, 2) THEN 1 ELSE 2
      |    END AS INT) AS channels,
      |  CASE WHEN var = 6 THEN NULL ELSE TRUE END AS cbr,
      |  CAST(CASE var WHEN 0 THEN 4 WHEN 1 THEN 5 WHEN 2 THEN 3
      |    WHEN 3 THEN 3 WHEN 4 THEN 2 WHEN 5 THEN 3 END AS BIGINT)
      |    AS n_frames,
      |  CAST(CASE var WHEN 0 THEN 4 * flen WHEN 1 THEN 5 * flen + 2 + odd
      |    WHEN 2 THEN 3 * 522 WHEN 3 THEN 3 * flen WHEN 4 THEN 2 * flen
      |    WHEN 5 THEN 3 * flen END AS BIGINT) AS frame_bytes,
      |  CAST(CASE var WHEN 0 THEN 4 * 1152 * 1000 // sr
      |    WHEN 1 THEN 5 * 576 * 1000 // sr
      |    WHEN 2 THEN 3 * 1152 * 1000 // 44100
      |    WHEN 3 THEN 3 * 1152 * 1000 // sr
      |    WHEN 4 THEN 2 * 1152 * 1000 // sr
      |    WHEN 5 THEN 3 * 384 * 1000 // sr END AS BIGINT) AS duration_ms,
      |  CASE WHEN var = 2 THEN 'xing' END AS vbr_tag,
      |  CAST(CASE WHEN var = 2 THEN 1000 + doc_id % 100 END AS BIGINT)
      |    AS vbr_frames,
      |  CAST(CASE WHEN var = 4 THEN flen // 2
      |    WHEN var IN (0, 1, 2, 3, 5) THEN 0 END AS BIGINT)
      |    AS trailing_bytes
      |FROM d ORDER BY doc_id""".stripMargin

  val q217_sql: String = {
    val (wavWalk, wavLast) = wavWalkSql("mm", "cw")
    val (aviWalk, aviLast) = aviWalkSql("mm", "ca")
    val (mp4Walk, mp4Last) = mp4WalkSql("mm", "cp")
    def cnt(cond: String, name: String) =
      s"CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS $name"
    // little-endian read that is TOTAL on short payloads: substr past
    // the end yields '', and TRY_CAST('0x') is null where CAST errors —
    // the nulls only arise where the length gate already forces the
    // claim to FALSE (false AND null = false), matching the Spark
    // parser's total reads
    def tln(off: String, n: Int) = {
      val pairs = (n - 1 to 0 by -1)
        .map(i => s"substr(hexs, 2*($off + $i) + 1, 2)").mkString(" || ")
      s"TRY_CAST('0x' || $pairs AS BIGINT)"
    }
    "WITH " + bmpHexCtes("czm", "czc", "WHERE doc_id % 6 = 0") + ",\n" +
      "czw AS (" + wavHexSql("WHERE doc_id % 6 = 1") + "),\n" +
      "cza AS (" + aviHexSql("WHERE doc_id % 6 = 2") + "),\n" +
      "czp AS (" + mp4HexSql("WHERE doc_id % 6 = 3") + "),\n" +
      "czi AS (" + imgHexSql("WHERE doc_id % 6 >= 4") + "),\n" +
      """mm AS MATERIALIZED (SELECT doc_id, hexs FROM czc
        |  UNION ALL SELECT doc_id, hexs FROM czw
        |  UNION ALL SELECT doc_id, hexs FROM cza
        |  UNION ALL SELECT doc_id, hexs FROM czp
        |  UNION ALL SELECT doc_id, hexs FROM czi),""".stripMargin + "\n" +
      wavWalk + ",\n" + aviWalk + ",\n" + mp4Walk + ",\n" +
      s"""wv AS (SELECT doc_id, $wavOkSql AS wav_ok FROM $wavLast),
       |av AS (SELECT doc_id, $aviOkSql AS avi_ok FROM $aviLast),
       |pv AS (SELECT doc_id, $mp4OkSql AS mp4_ok FROM $mp4Last),
       |bg AS (SELECT doc_id, hexs,
       |    least(${tln("18", 4)}, ${2 * Multimodal.BmpMaxPixels}) AS wx,
       |    least(${tln("22", 4)}, ${2 * Multimodal.BmpMaxPixels}) AS hh,
       |    ${tln("10", 4)} AS doffx,
       |    length(hexs) >= 108 AND substr(hexs, 1, 4) = '424D'
       |      AND ${tln("14", 4)} = 40 AND ${tln("26", 2)} = 1
       |      AND ${tln("28", 2)} = 24 AND ${tln("30", 4)} = 0 AS is_bmp
       |  FROM mm),
       |bv AS (SELECT doc_id,
       |    is_bmp AND wx > 0 AND hh > 0 AND wx * hh <= ${Multimodal.BmpMaxPixels}
       |      AND doffx >= 54
       |      AND doffx + ((3 * wx + 3) // 4) * 4 * hh
       |          <= CAST(length(hexs)/2 AS BIGINT) AS bmp_ok
       |  FROM bg),
       |g AS (SELECT mm.doc_id % 6 AS grp, mm.hexs,
       |    coalesce(length(mm.hexs) >= 52
       |      AND substr(mm.hexs, 1, 16) = '${Multimodal.PngMagicHex}', FALSE) AS png_ok,
       |    coalesce(length(mm.hexs) >= 8
       |      AND substr(mm.hexs, 1, 4) = 'FFD8', FALSE) AS jpeg_ok,
       |    coalesce(bv.bmp_ok, FALSE) AS bmp_ok,
       |    coalesce(wv.wav_ok, FALSE) AS wav_ok,
       |    coalesce(av.avi_ok, FALSE) AS avi_ok,
       |    coalesce(pv.mp4_ok, FALSE) AS mp4_ok
       |  FROM mm JOIN bv USING (doc_id) JOIN wv USING (doc_id)
       |       JOIN av USING (doc_id) JOIN pv USING (doc_id))
       |SELECT grp, CAST(count(*) AS BIGINT) AS n_media,
       |  ${cnt("hexs IS NULL", "n_null")},
       |  ${cnt("hexs IS NOT NULL AND length(hexs) = 0", "n_empty")},
       |  ${cnt("png_ok", "n_png")},
       |  ${cnt("jpeg_ok", "n_jpeg")},
       |  ${cnt("bmp_ok", "n_bmp")},
       |  ${cnt("wav_ok", "n_wav")},
       |  ${cnt("avi_ok", "n_avi")},
       |  ${cnt("mp4_ok", "n_mp4")},
       |  ${cnt("hexs IS NOT NULL AND length(hexs) > 0 AND NOT (png_ok" +
          " OR jpeg_ok OR bmp_ok OR wav_ok OR avi_ok OR mp4_ok)", "n_unknown")}
       |FROM g GROUP BY grp ORDER BY grp""".stripMargin
  }

  val q168_sql: String = {
    // pixel byte i of the LOGICAL stream (3w bytes/row) through the
    // 4-byte stride — pad bytes never enter the sums; rbx/hhx are
    // zeroed for invalid rows so garbage headers can't size the loop
    val off = s"(doffx + (i // rbx) * stride + i % rbx)"
    val v = s"CAST('0x' || substr(hexs, 2*$off + 1, 2) AS BIGINT)"
    def chSum(ch: Int, sq: Boolean) = {
      val term = if (sq) s"$v * $v" else v
      s"CAST(list_sum(list_transform(range(rbx * hhx), i -> " +
        s"CASE WHEN i % 3 = $ch THEN $term ELSE 0 END)) AS BIGINT)"
    }
    def meanVar(ch: Int, tag: String) = {
      val s0 = chSum(ch, sq = false); val q0 = chSum(ch, sq = true)
      s"""  CASE WHEN ok THEN $s0 END AS sum_$tag,
         |  CASE WHEN ok THEN round($s0 / np, 6) END AS mean_$tag,
         |  CASE WHEN ok THEN round($q0 / np - ($s0 / np) * ($s0 / np), 6) END AS var_$tag""".stripMargin
    }
    "WITH " + bmpCtes + "\n" +
      s"""SELECT doc_id,
       |  CASE WHEN ok THEN 'bmp' ELSE 'unknown' END AS format,
       |  CASE WHEN ok THEN wx END AS width,
       |  CASE WHEN ok THEN hh END AS height,
       |  CASE WHEN ok THEN wx * hh END AS n_pixels,
       |${meanVar(0, "b")},
       |${meanVar(1, "g")},
       |${meanVar(2, "r")}
       |FROM v2 ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q177
  // Perceptual audio dedup over DECODED content: every valid WAV maps
  // to a container-invariant signature (channels, bit depth, coarse
  // mean-square energy bucket — exact BIGINT arithmetic, no sqrt), and
  // signature groups name a canonical member. Byte-level hashing CANNOT
  // find these groups: the synthetic corpus varies RIFF framing
  // (optional LIST/INFO chunk, chunk sizes) independently of the PCM
  // payload, so only the decoded-sample path sees through the
  // container. Grouping windows partition per signature — bounded by
  // group size, never corpus-sized.
  val AudioFpBucket8 = 64L
  val AudioFpBucket16 = 4194304L

  val q177_audio_fingerprint: Q = (s, dir) => {
    val m = Multimodal.syntheticWav(Tables.load(s, dir, "documents"))
    // Invalid rows are NOT filtered until after the window: a filter
    // between the parse and the fold pushes `valid` all the way into
    // the file scan, inlining the whole construction + RIFF walk into
    // the scan filter (a 500 KB plan past the codegen size limit →
    // interpreted fallback, measured 10x). Null-keyed invalid rows ride
    // the window harmlessly and drop at the top, where `valid` — not a
    // partition key — cannot push through the Window operator.
    val parsed = m.select(
      col("media_id").as("doc_id"), col("media"),
      Multimodal.parseWavPcm(col("media")).as("p"))
      .select(col("doc_id"), col("media"),
        col("p.valid").as("valid"), col("p.channels").as("channels"),
        col("p.bits_per_sample").as("bits_per_sample"),
        col("p.n_frames").as("n_frames"), col("p.doff").as("doff"))
      .select(col("doc_id"), col("valid"), col("channels"),
        col("bits_per_sample"), col("n_frames"),
        when(col("valid"), Multimodal.pcmSsq0(col("media"), col("doff"),
          col("channels"), col("bits_per_sample"), col("n_frames")))
          .as("ssq"))
      .select(col("doc_id"), col("valid"), col("channels"),
        col("bits_per_sample"),
        expr(s"(ssq div n_frames) div (CASE WHEN bits_per_sample = 8 " +
          s"THEN $AudioFpBucket8 ELSE $AudioFpBucket16 END)").as("msq_bucket"))
    val sig = org.apache.spark.sql.expressions.Window
      .partitionBy("channels", "bits_per_sample", "msq_bucket")
    parsed
      .withColumn("group_n", count(lit(1)).over(sig))
      .withColumn("canonical_id", min("doc_id").over(sig))
      .filter(col("valid"))
      .select(col("doc_id"), col("channels"), col("bits_per_sample"),
        col("msq_bucket"), col("group_n"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"))
      .orderBy("doc_id")
  }

  val q177_sql: String = "WITH " + wavPcmCtes + ",\n" +
    s"""e AS (SELECT doc_id, ch, bits, nf,
       |        ${wavChSum(0, sq = true)} AS ssq
       |      FROM v2 WHERE ok),
       |g AS (SELECT doc_id, ch, bits,
       |        (ssq // nf) // (CASE WHEN bits = 8 THEN $AudioFpBucket8
       |                             ELSE $AudioFpBucket16 END) AS msq_bucket
       |      FROM e),
       |s AS (SELECT *,
       |        count(*) OVER (PARTITION BY ch, bits, msq_bucket) AS group_n,
       |        min(doc_id) OVER (PARTITION BY ch, bits, msq_bucket)
       |          AS canonical_id
       |      FROM g)
       |SELECT doc_id, ch AS channels, bits AS bits_per_sample, msq_bucket,
       |  CAST(group_n AS BIGINT) AS group_n, canonical_id,
       |  doc_id = canonical_id AS is_canonical
       |FROM s ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q195
  // Perceptual IMAGE dedup over decoded pixels: every valid BMP maps to
  // an average-hash (bit j set iff pixel j's integer luminance exceeds
  // the image mean — exact BIGINT compare n·lum > Σlum), and near-dup
  // pairs at Hamming distance ≤ 1 are found by bit-sampling LSH
  // multi-probe: each row emits its hash plus every single-bit flip as
  // probe keys, and candidates come from an EQUI-join on (w, h, probe)
  // — the Hamming-ball-1 query is complete (probe r=1 covers d≤1) with
  // zero all-pairs work. 100 TB shape: probes per row = n_px + 1
  // (bounded; an 8×8 pooled aHash emits 65), and the join shuffles only
  // (id, hash) pairs — pixels never leave the scan. The distance-0 /
  // distance-1 split in the output is the knob a curator uses to pick
  // exact-only vs tolerant dedup. The PAIR LIST itself is a demo over
  // the MediaPairCap window (see the cap's scaladoc for the sf1
  // measurement that forced it); q210's canonical assignment is the
  // uncapped scale path.
  val q195_image_ahash: Q = (s, dir) => {
    log.info(s"q195 pair-list demo capped at doc_id < $MediaPairCap " +
      "(output grows super-linearly on the narrow synthetic hash space; " +
      "q210 is the uncapped canonical-assignment scale path)")
    val m = Multimodal.syntheticBmp(
      Tables.load(s, dir, "documents").filter(col("doc_id") < MediaPairCap))
    // same pushdown discipline as q177: `valid` is filtered only after
    // a Window keyed on derived columns, so the construction + parse
    // never inlines into the parquet scan filter
    val parsed = m.select(col("media_id").as("doc_id"), col("media"),
      Multimodal.parseBmp(col("media")).as("p"))
      .select(col("doc_id"), col("media"),
        col("p.valid").as("valid"), col("p.width").as("width"),
        col("p.height").as("height"), col("p.data_off").as("data_off"))
      .select(col("doc_id"), col("valid"), col("width"), col("height"),
        col("media"), col("data_off"),
        when(col("valid"), Multimodal.bmpLumSum(col("media"),
          col("data_off"), col("width"), col("height"))).as("lum_sum"))
      .select(col("doc_id"), col("valid"), col("width"), col("height"),
        (col("width") * col("height")).as("n_px"),
        when(col("valid"), Multimodal.bmpAHash(col("media"), col("data_off"),
          col("width"), col("height"), col("lum_sum"))).as("ahash"))
    val sig = org.apache.spark.sql.expressions.Window
      .partitionBy("width", "height", "ahash")
    // localCheckpoint truncates the lineage at the (id, w, h, hash)
    // table — 5 narrow columns, pixels long gone. Without it the
    // self-join below re-plans the whole construction + parse + two
    // nested pixel folds on BOTH sides and the optimizer pass over the
    // duplicated ~MB expression tree never returns (same pathology as
    // the MATERIALIZED note on wavPcmCtes, Spark edition).
    // group_n must survive until the checkpoint: it is what keeps the
    // Window alive under column pruning — dropping it earlier lets the
    // optimizer erase the Window, and the `valid` filter then inlines
    // the whole construction into the scan (codegen-size fallback).
    val hashed = parsed
      .withColumn("group_n", count(lit(1)).over(sig))
      .filter(col("valid"))
      .select("doc_id", "width", "height", "n_px", "ahash", "group_n")
      .localCheckpoint()
      .drop("group_n")
    val probes = hashed.select(col("doc_id"), col("width"), col("height"),
      col("ahash"),
      explode(concat(array(col("ahash")),
        transform(sequence(lit(0L), col("n_px") - 1), j =>
          col("ahash").bitwiseXOR(
            call_function("shiftleft", lit(1L), j.cast("int"))))))
      .as("probe"))
    probes.as("a").join(hashed.as("b"),
      col("a.width") === col("b.width") &&
        col("a.height") === col("b.height") &&
        col("a.probe") === col("b.ahash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.width").as("width"), col("a.height").as("height"),
        bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))).as("hamming"))
      .filter(col("hamming") <= 1) // probe construction already implies this
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  // --------------------------------------------------------------- q210
  // Perceptual-dedup CANONICAL ASSIGNMENT — q195's scale path. q195
  // emits every near-dup PAIR, and the sf1 measurement shows why that
  // cannot be the production default: collision groups fatten with n
  // when the hash space is small, so the pair OUTPUT grows
  // super-linearly (a(10×)=1.26, 789 MB shuffled at sf1 — the answer
  // is big, not the plan). A curator actually wants each doc's
  // canonical, so this runs the Hamming-ball-1 link over group
  // REPRESENTATIVES instead: one row per distinct (w, h, ahash)
  // probes its single-bit flips, links to neighbor groups, and every
  // group takes canonical = min(min-doc over its ball) — one
  // deterministic round, oracle-replayable. All the heavy columns
  // stop at the distinct-hash table (≤ min(n, hash-space) rows), docs
  // join back by (w, h, ahash) once, and the output is exactly n
  // rows. Measured at sf1: 0.7 MB shuffled vs q195's 789 MB.
  val q210_ahash_canonical: Q = (s, dir) => {
    val m = Multimodal.syntheticBmp(Tables.load(s, dir, "documents"))
    val parsed = m.select(col("media_id").as("doc_id"), col("media"),
      Multimodal.parseBmp(col("media")).as("p"))
      .select(col("doc_id"), col("media"),
        col("p.valid").as("valid"), col("p.width").as("width"),
        col("p.height").as("height"), col("p.data_off").as("data_off"))
      .select(col("doc_id"), col("valid"), col("width"), col("height"),
        col("media"), col("data_off"),
        when(col("valid"), Multimodal.bmpLumSum(col("media"),
          col("data_off"), col("width"), col("height"))).as("lum_sum"))
      .select(col("doc_id"), col("valid"), col("width"), col("height"),
        (col("width") * col("height")).as("n_px"),
        when(col("valid"), Multimodal.bmpAHash(col("media"), col("data_off"),
          col("width"), col("height"), col("lum_sum"))).as("ahash"))
    val sig = org.apache.spark.sql.expressions.Window
      .partitionBy("width", "height", "ahash")
    // same lineage-cut + window-keeps-the-filter-out-of-the-scan
    // discipline as q195 (see the comment there)
    val hashed = parsed
      .withColumn("group_n", count(lit(1)).over(sig))
      .filter(col("valid"))
      .select("doc_id", "width", "height", "n_px", "ahash", "group_n")
      .localCheckpoint()
      .drop("group_n")
    val groups = hashed.groupBy("width", "height", "n_px", "ahash")
      .agg(count(lit(1)).as("group_n"), min("doc_id").as("gmin"))
    val probes = groups.select(col("width"), col("height"), col("ahash"),
      explode(concat(array(col("ahash")),
        transform(sequence(lit(0L), col("n_px") - 1), j =>
          col("ahash").bitwiseXOR(
            call_function("shiftleft", lit(1L), j.cast("int"))))))
      .as("probe"))
    val linked = probes.as("a")
      .join(groups.select(col("width"), col("height"),
        col("ahash").as("bhash"), col("gmin")).as("b"),
        col("a.width") === col("b.width") &&
          col("a.height") === col("b.height") &&
          col("a.probe") === col("b.bhash"))
      .groupBy(col("a.width").as("width"), col("a.height").as("height"),
        col("a.ahash").as("ahash"))
      .agg(min(col("b.gmin")).as("canonical_id"))
    hashed.select("doc_id", "width", "height", "ahash")
      .join(groups.select("width", "height", "ahash", "group_n"),
        Seq("width", "height", "ahash"))
      .join(linked, Seq("width", "height", "ahash"))
      .select(col("doc_id"), col("width"), col("height"), col("ahash"),
        col("group_n"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"))
      .orderBy("doc_id")
  }

  val q210_sql: String = {
    def off(i: String) = s"(doffx + (($i) // rb) * stride + ($i) % rb)"
    def u8(o: String) = s"CAST('0x' || substr(hexs, 2*$o + 1, 2) AS BIGINT)"
    def lum(j: String) =
      s"(2 * ${u8(off(s"3*($j) + 2"))} + 5 * ${u8(off(s"3*($j) + 1"))}" +
        s" + ${u8(off(s"3*($j)"))})"
    "WITH " + bmpCtes + ",\n" +
      // materialize the per-pixel luminance LISTS (≤ 64 BIGINTs/doc),
      // not the BMP hex strings: the h0-with-hexs form held the whole
      // synthetic image corpus in memory TWICE (suml pass + bit pass)
      // and rode the oracle runner's 24 GB limit at sf0.3 — flaky OOM
      // under ambient load. The bit pass walks lums with the
      // INDEX-lambda form, never `lums[j+1]` — a list-extract inside a
      // lambda over range() is its own DuckDB memory pathology (OOM at
      // 8 GB where this form finishes in 17 s). (x, j) is 1-based, so
      // power(2, j−1) ≡ the old power(2, j) bit — output bit-identical.
      s"""l0 AS MATERIALIZED (SELECT doc_id, wx, hh, wx * hh AS npx,
       |    list_transform(range(wx * hh), j -> ${lum("j")}) AS lums
       |  FROM v2 WHERE ok),
       |h1 AS MATERIALIZED (SELECT doc_id, wx, hh, npx,
       |    CAST(coalesce(list_sum(list_transform(lums, (x, j) ->
       |      CASE WHEN npx * x > suml
       |           THEN (1::BIGINT << CAST(j - 1 AS INT)) ELSE 0 END)), 0)
       |      AS BIGINT) AS ahash
       |  FROM (SELECT *, CAST(list_sum(lums) AS BIGINT) AS suml FROM l0)),
       |grp AS MATERIALIZED (SELECT wx, hh, npx, ahash,
       |    CAST(count(*) AS BIGINT) AS group_n, min(doc_id) AS gmin
       |  FROM h1 GROUP BY 1, 2, 3, 4),
       |pr AS (SELECT wx, hh, ahash, UNNEST(list_prepend(ahash,
       |    list_transform(range(npx),
       |      j -> xor(ahash, 1::BIGINT << CAST(j AS INT))))) AS probe
       |  FROM grp),
       |lk AS (SELECT a.wx, a.hh, a.ahash, min(b.gmin) AS canonical_id
       |  FROM pr a JOIN grp b
       |    ON a.wx = b.wx AND a.hh = b.hh AND a.probe = b.ahash
       |  GROUP BY 1, 2, 3)
       |SELECT h.doc_id, h.wx AS width, h.hh AS height, h.ahash,
       |  g.group_n, l.canonical_id, h.doc_id = l.canonical_id AS is_canonical
       |FROM h1 h
       |JOIN grp g ON g.wx = h.wx AND g.hh = h.hh AND g.ahash = h.ahash
       |JOIN lk l ON l.wx = h.wx AND l.hh = h.hh AND l.ahash = h.ahash
       |ORDER BY h.doc_id""".stripMargin
  }

  val q195_sql: String = {
    // luminance of logical pixel j: bytes 3j (B), 3j+1 (G), 3j+2 (R)
    // of the pixel stream, each mapped through the row stride
    def off(i: String) = s"(doffx + (($i) // rb) * stride + ($i) % rb)"
    def u8(o: String) = s"CAST('0x' || substr(hexs, 2*$o + 1, 2) AS BIGINT)"
    def lum(j: String) =
      s"(2 * ${u8(off(s"3*($j) + 2"))} + 5 * ${u8(off(s"3*($j) + 1"))}" +
        s" + ${u8(off(s"3*($j)"))})"
    "WITH " + bmpCtesWhere(s"WHERE doc_id < $MediaPairCap") + ",\n" +
      s"""h0 AS MATERIALIZED (SELECT doc_id, wx, hh, wx * hh AS npx,
       |    hexs, doffx, stride, rb,
       |    CAST(list_sum(list_transform(range(wx * hh), j ->
       |      ${lum("j")})) AS BIGINT) AS suml
       |  FROM v2 WHERE ok),
       |h1 AS MATERIALIZED (SELECT doc_id, wx, hh, npx,
       |    CAST(coalesce(list_sum(list_transform(range(npx), j ->
       |      CASE WHEN npx * ${lum("j")} > suml
       |           THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END)), 0)
       |      AS BIGINT) AS ahash
       |  FROM h0)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  a.wx AS width, a.hh AS height,
       |  CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
       |FROM h1 a JOIN h1 b
       |  ON a.wx = b.wx AND a.hh = b.hh AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.ahash, b.ahash)) <= 1
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // --------------------------------------------------------------- q196
  // PCM audio-quality census: clipped-sample and silent-sample counts
  // over every decoded sample of every channel — the audio analog of
  // the text quality gate. Thresholds are bit-depth-scaled integers
  // (95% full scale / ~-36 dBFS), so the whole census is one exact
  // BIGINT fold per row fused into the scan; only (id, counts) rows
  // ever move, and the verdict derives from integer cross-products
  // (n·10 ≥ total), never a float ratio.
  val q196_audio_quality: Q = (s, dir) => {
    val m = Multimodal.syntheticWav(Tables.load(s, dir, "documents"))
    m.select(col("media_id").as("doc_id"), col("media"),
      Multimodal.parseWavPcm(col("media")).as("p"))
      .select(col("doc_id"), col("media"),
        col("p.valid").as("valid"), col("p.channels").as("channels"),
        col("p.bits_per_sample").as("bits_per_sample"),
        col("p.n_frames").as("n_frames"), col("p.doff").as("doff"))
      .select(col("doc_id"), col("valid"), col("channels"),
        col("bits_per_sample"), col("n_frames"),
        when(col("valid"), Multimodal.pcmQualityCounts(col("media"),
          col("doff"), col("channels"), col("bits_per_sample"),
          col("n_frames"))).as("qc"))
      .select(col("doc_id"),
        when(col("valid"), lit("wav")).otherwise(lit("unknown")).as("format"),
        col("channels"), col("bits_per_sample"),
        when(col("valid"), col("n_frames") * col("channels")).as("n_samples"),
        col("qc.n_clipped").as("n_clipped"),
        col("qc.n_silent").as("n_silent"),
        when(col("valid"), round(col("qc.n_clipped") /
          (col("n_frames") * col("channels")).cast("double"), 6)).as("clip_ratio"),
        when(col("valid"), round(col("qc.n_silent") /
          (col("n_frames") * col("channels")).cast("double"), 6)).as("silence_ratio"),
        when(col("valid"),
          when(col("qc.n_clipped") * 10 >= col("n_frames") * col("channels"),
            lit("clipped"))
            .when(col("qc.n_silent") * 2 >= col("n_frames") * col("channels"),
              lit("silent"))
            .otherwise(lit("ok"))).as("verdict"))
      .orderBy("doc_id")
  }

  val q196_sql: String = {
    val clipT = s"(CASE WHEN bits = 8 THEN ${Multimodal.ClipThresh8}" +
      s" ELSE ${Multimodal.ClipThresh16} END)"
    val silT = s"(CASE WHEN bits = 8 THEN ${Multimodal.SilenceThresh8}" +
      s" ELSE ${Multimodal.SilenceThresh16} END)"
    def absCount(cmp: String) =
      s"CAST(list_sum(list_transform(range(nfx * chx), i -> " +
        s"CASE WHEN abs(${wavSampleV("i")}) $cmp THEN 1 ELSE 0 END)) AS BIGINT)"
    "WITH " + wavPcmCtes + ",\n" +
      s"""q AS (SELECT doc_id, ok, ch, bits, nf,
       |    CASE WHEN ok THEN ${absCount(s">= $clipT")} END AS nc,
       |    CASE WHEN ok THEN ${absCount(s"<= $silT")} END AS ns
       |  FROM v2)
       |SELECT doc_id,
       |  CASE WHEN ok THEN 'wav' ELSE 'unknown' END AS format,
       |  CASE WHEN ok THEN ch END AS channels,
       |  CASE WHEN ok THEN bits END AS bits_per_sample,
       |  CASE WHEN ok THEN nf * ch END AS n_samples,
       |  nc AS n_clipped, ns AS n_silent,
       |  CASE WHEN ok THEN round(nc / CAST(nf * ch AS DOUBLE), 6) END AS clip_ratio,
       |  CASE WHEN ok THEN round(ns / CAST(nf * ch AS DOUBLE), 6) END AS silence_ratio,
       |  CASE WHEN ok THEN
       |    CASE WHEN nc * 10 >= nf * ch THEN 'clipped'
       |         WHEN ns * 2 >= nf * ch THEN 'silent'
       |         ELSE 'ok' END END AS verdict
       |FROM q ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q236
  // Oracle-checked REAL uncompressed-DIB video frame decode — the q224
  // playbook applied to the one video payload that needs no codec:
  // '##db' chunks under biCompression = 0 are raw bottom-up 24-bit
  // rows with 4-byte stride padding, so the Spark side must run the
  // real container walk (hdrl → vids strl → strf, then every movi
  // frame chunk, stride-aware so the POISONED pad bytes never enter
  // the statistics) while DuckDB recomputes the expected per-channel
  // sums straight from the pixel formula — it never sees the bytes.
  // The defect variants (id mod 9 = 5..8) must land in their census
  // buckets with the header fields still surfaced; with this, the
  // labeled decode stub narrows to COMPRESSED video codecs + MP3/AAC
  // samples.
  val q236_avi_dib_decode: Q = (s, dir) => {
    val m = Multimodal.syntheticAviDib(Tables.load(s, dir, "documents"))
    val d = Multimodal.aviDibDecode(col("media"))
    m.select(col("media_id").as("doc_id"), d.as("d"))
      .select(col("doc_id"),
        col("d.valid").as("valid"), col("d.reason").as("reason"),
        col("d.width").cast("long").as("width"),
        col("d.height").cast("long").as("height"),
        col("d.bit_count").cast("long").as("bit_count"),
        col("d.compression").cast("long").as("compression"),
        col("d.n_frames").as("n_frames"), col("d.n_px").as("n_px"),
        col("d.sum_b").as("sum_b"), col("d.sum_g").as("sum_g"),
        col("d.sum_r").as("sum_r"),
        col("d.sq_b").as("sq_b"), col("d.sq_g").as("sq_g"),
        col("d.sq_r").as("sq_r"))
      .orderBy("doc_id")
  }

  val q236_sql: String =
    """WITH v AS (SELECT doc_id, doc_id % 9 AS var,
      |    1 + doc_id % 4 AS w, 1 + doc_id % 3 AS h, 1 + doc_id % 5 AS nf
      |  FROM documents),
      |px AS (SELECT doc_id,
      |    (doc_id + 23 * f.f + 7 * j.j) % 256 AS p, j.j % 3 AS c
      |  FROM v, generate_series(0, 4) AS f(f),
      |       generate_series(0, 35) AS j(j)
      |  WHERE var <= 4 AND f.f < nf AND j.j < 3 * w * h),
      |st AS (SELECT doc_id,
      |    CAST(sum(p) FILTER (WHERE c = 0) AS BIGINT) AS sum_b,
      |    CAST(sum(p) FILTER (WHERE c = 1) AS BIGINT) AS sum_g,
      |    CAST(sum(p) FILTER (WHERE c = 2) AS BIGINT) AS sum_r,
      |    CAST(sum(p * p) FILTER (WHERE c = 0) AS BIGINT) AS sq_b,
      |    CAST(sum(p * p) FILTER (WHERE c = 1) AS BIGINT) AS sq_g,
      |    CAST(sum(p * p) FILTER (WHERE c = 2) AS BIGINT) AS sq_r
      |  FROM px GROUP BY 1)
      |SELECT d.doc_id, d.var <= 4 AS valid,
      |  CASE d.var WHEN 5 THEN 'compressed' WHEN 6 THEN 'trunc_frame'
      |             WHEN 7 THEN 'no_strf' WHEN 8 THEN 'not_avi'
      |  END AS reason,
      |  CASE WHEN d.var <= 6 THEN CAST(d.w AS BIGINT) END AS width,
      |  CASE WHEN d.var <= 6 THEN CAST(d.h AS BIGINT) END AS height,
      |  CASE WHEN d.var <= 6 THEN CAST(24 AS BIGINT) END AS bit_count,
      |  CASE WHEN d.var <= 6 THEN
      |    CAST(CASE WHEN d.var = 5 THEN 1 ELSE 0 END AS BIGINT)
      |  END AS compression,
      |  CASE WHEN d.var <= 4 THEN CAST(d.nf AS BIGINT)
      |       WHEN d.var = 6 THEN CAST(d.nf - 1 AS BIGINT) END AS n_frames,
      |  CASE WHEN d.var <= 4 THEN CAST(d.w * d.h * d.nf AS BIGINT) END AS n_px,
      |  st.sum_b, st.sum_g, st.sum_r, st.sq_b, st.sq_g, st.sq_r
      |FROM v d LEFT JOIN st USING (doc_id) ORDER BY d.doc_id""".stripMargin

  // --------------------------------------------------------------- q237
  // Motion-JPEG geometry census — the exactly-oracle-checkable HALF of
  // MJPEG support: when strf declares biCompression 'MJPG', every
  // '##dc' movi chunk is one complete baseline JPEG. The walk's
  // geometry (frame count, each frame's size, each frame's 2-byte
  // magic, truncation prefix) is pure id arithmetic in the synthetic
  // corpus, so DuckDB replays it without byte access while Spark runs
  // the real AviMjpegProbe extraction. The frame PAYLOADS decode
  // through the already-shipped JDK JPEG path — spec-pinned
  // (MjpegSpec) because JPEG IDCT rounding is implementation-defined,
  // not ANSI-replayable.
  val q237_mjpeg_census: Q = (s, dir) => {
    val m = Multimodal.syntheticAviMjpeg(Tables.load(s, dir, "documents"))
    val d = Multimodal.aviMjpegFrames(col("media"))
    val flat = m.select(col("media_id").as("doc_id"), d.as("d"))
      .select(col("doc_id"), col("d.valid").as("valid"),
        col("d.reason").as("reason"), col("d.n_frames").as("n_frames"),
        col("d.frames").as("frames"))
    val lens = transform(col("frames"), f => length(f).cast("long"))
    flat.select(col("doc_id"), col("valid"), col("reason"), col("n_frames"),
      when(size(col("frames")) > 0,
        aggregate(lens, lit(0L), _ + _)).as("total_bytes"),
      when(size(col("frames")) > 0, array_min(lens)).as("min_bytes"),
      when(size(col("frames")) > 0, array_max(lens)).as("max_bytes"),
      when(size(col("frames")) > 0,
        size(filter(col("frames"),
          f => hex(substring(f, 1, 2)) === lit("FFD8"))).cast("long"))
        .as("n_jpeg_magic"))
      .orderBy("doc_id")
  }

  val q237_sql: String =
    """WITH v AS (SELECT doc_id, doc_id % 7 AS var, 1 + doc_id % 6 AS nf
      |  FROM documents),
      |fr AS (SELECT doc_id,
      |    40 + (7 * doc_id + 13 * f.f) % 59 AS len,
      |    (doc_id + f.f) % 5 <> 0 AS magic
      |  FROM v, generate_series(0, 5) AS f(f)
      |  WHERE (var <= 3 AND f.f < nf) OR (var = 5 AND f.f < nf - 1)),
      |st AS (SELECT doc_id,
      |    CAST(sum(len) AS BIGINT) AS total_bytes,
      |    CAST(min(len) AS BIGINT) AS min_bytes,
      |    CAST(max(len) AS BIGINT) AS max_bytes,
      |    CAST(count(*) FILTER (WHERE magic) AS BIGINT) AS n_jpeg_magic
      |  FROM fr GROUP BY 1)
      |SELECT d.doc_id, d.var <= 3 AS valid,
      |  CASE d.var WHEN 4 THEN 'not_mjpeg' WHEN 5 THEN 'trunc_frame'
      |             WHEN 6 THEN 'not_avi' END AS reason,
      |  CASE WHEN d.var <= 3 THEN CAST(d.nf AS BIGINT)
      |       WHEN d.var = 5 THEN CAST(d.nf - 1 AS BIGINT) END AS n_frames,
      |  st.total_bytes, st.min_bytes, st.max_bytes, st.n_jpeg_magic
      |FROM v d LEFT JOIN st USING (doc_id) ORDER BY d.doc_id""".stripMargin

  val all: Map[String, Q] = Map(
    "q236_avi_dib_decode" -> q236_avi_dib_decode,
    "q237_mjpeg_census" -> q237_mjpeg_census,
    "q210_ahash_canonical" -> q210_ahash_canonical,
    "q195_image_ahash" -> q195_image_ahash,
    "q196_audio_quality" -> q196_audio_quality,
    "q177_audio_fingerprint" -> q177_audio_fingerprint,
    "q97_image_meta" -> q97_image_meta,
    "q100_audio_meta" -> q100_audio_meta,
    "q102_video_meta" -> q102_video_meta,
    "q114_container_meta" -> q114_container_meta,
    "q167_wav_pcm_stats" -> q167_wav_pcm_stats,
    "q168_bmp_pixel_stats" -> q168_bmp_pixel_stats,
    "q217_media_census" -> q217_media_census,
    "q224_png_decode" -> q224_png_decode,
    "q226_g711_decode" -> q226_g711_decode,
    "q229_au_aiff_decode" -> q229_au_aiff_decode,
    "q230_adpcm_decode" -> q230_adpcm_decode,
    "q232_mpeg_walk" -> q232_mpeg_walk)

  val oracle: Map[String, String] = Map(
    "q236_avi_dib_decode" -> q236_sql,
    "q237_mjpeg_census" -> q237_sql,
    "q210_ahash_canonical" -> q210_sql,
    "q195_image_ahash" -> q195_sql,
    "q196_audio_quality" -> q196_sql,
    "q177_audio_fingerprint" -> q177_sql,
    "q97_image_meta" -> q97_sql,
    "q100_audio_meta" -> q100_sql,
    "q102_video_meta" -> q102_sql,
    "q114_container_meta" -> q114_sql,
    "q167_wav_pcm_stats" -> q167_sql,
    "q168_bmp_pixel_stats" -> q168_sql,
    "q217_media_census" -> q217_sql,
    "q224_png_decode" -> q224_sql,
    "q226_g711_decode" -> q226_sql,
    "q229_au_aiff_decode" -> q229_sql,
    "q230_adpcm_decode" -> q230_sql,
    "q232_mpeg_walk" -> q232_sql)
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  lazy val media = {
    val rows = (0L until 10L).map { i =>
      Row(i, Array.fill[Byte]((i * 512 + 64).toInt)((i % 127).toByte),
        Row("img", 64, 64, null, null))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("extractFeatures: fixed-dim float features, deterministic") {
    val f1 = Multimodal.extractFeatures(media, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(media, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1.size === 10)
    assert(f1.values.forall(_.size === 16))
    assert(f1 === f2)
    assert(f1(1L) !== f1(2L)) // different payloads → different features
  }

  test("sampleFrames: every-N frame windows of the payload") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 9), everyN = 2,
      frameBytes = 512)
    val idx = frames.select("frame_idx").collect().map(_.getInt(0)).toSeq
    assert(idx === Seq(0, 2, 4, 6, 8))
  }

  test("repartitionForPayloads sizes partitions by byte budget") {
    val parts = Multimodal.repartitionForPayloads(media, targetBytes = 1024)
      .rdd.getNumPartitions
    assert(parts > 1) // ~25 KB of payload / 1 KB budget → many partitions
  }

  private def hexToBytes(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray

  private def parseOne(payload: Array[Byte]): Row = {
    import spark.implicits._
    Seq(Tuple1(payload)).toDF("media")
      .select(Multimodal.parseImageHeader(col("media")).as("m"))
      .select("m.format", "m.width", "m.height", "m.bit_depth", "m.channels")
      .head()
  }

  test("parseImageHeader decodes a REAL png file (1x1 RGBA, the canonical tiny png)") {
    // a complete, valid 67-byte PNG: signature, IHDR (1x1, 8-bit,
    // colour type 6 = RGBA), IDAT (zlib), IEND — real bytes, not a fixture
    val png = hexToBytes(
      "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c489" +
        "0000000a49444154789c63000100000500010d0a2db40000000049454e44ae426082")
    assert(parseOne(png) === Row("png", 1L, 1L, 8L, 4L))
  }

  test("parseImageHeader walks a REAL jpeg segment stream to SOF0") {
    // SOI | JFIF APP0 (18 bytes) | DQT (5-byte toy table) | SOF0 for a
    // 2-wide x 3-high, 8-bit, 3-component frame — the SOF is NOT at a
    // fixed offset, the marker walk has to skip APP0 and DQT to find it
    val jpeg = hexToBytes(
      "ffd8" +
        "ffe000104a46494600010100000100010000" + // APP0, length 0x0010
        "ffdb000400aa" +                          // DQT, length 0x0004 (2 payload bytes)
        "ffc0001108000300020301110002110103110100") // SOF0: len 17, 8-bit, h=3, w=2, 3 comps
    assert(parseOne(jpeg) === Row("jpeg", 2L, 3L, 8L, 3L))
  }

  test("parseImageHeader: garbage, truncated and null payloads are unknown, not errors") {
    assert(parseOne("not an image at all".getBytes("UTF-8")).getString(0) === "unknown")
    assert(parseOne(Array[Byte](0x89.toByte, 0x50)).getString(0) === "unknown")
    assert(parseOne(Array.emptyByteArray).getString(0) === "unknown")
    // jpeg SOI but no SOF within budget → format jpeg, null dimensions
    val headless = hexToBytes("ffd8ffe000104a46494600010100000100010000ffd9")
    val r = parseOne(headless)
    assert(r.getString(0) === "jpeg" && r.isNullAt(1) && r.isNullAt(2))
  }

  test("syntheticMedia round-trips through parseImageHeader") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc body $i")).toDF("doc_id", "text")
    val parsed = Multimodal.syntheticMedia(docs)
      .select(col("media_id"),
        Multimodal.parseImageHeader(col("media")).as("m"))
      .select(col("media_id"), col("m.format"), col("m.width"),
        col("m.height"), col("m.bit_depth"), col("m.channels"))
      .collect()
    assert(parsed.length === 200)
    parsed.foreach { r =>
      val id = r.getLong(0)
      if (id % 97 == 0) {
        assert(r.getString(1) === "unknown")
      } else {
        val expectFmt = if (id % 2 == 0) "png" else "jpeg"
        assert(r.getString(1) === expectFmt, s"id=$id")
        assert(r.getLong(2) === 16 + id % 1009, s"width id=$id")
        assert(r.getLong(3) === 16 + (id * 7) % 997, s"height id=$id")
        assert(r.getLong(4) === 8L, s"depth id=$id")
        if (expectFmt === "jpeg")
          assert(r.getLong(5) === 1 + id % 3, s"channels id=$id")
      }
    }
  }

  private def parseWav(payload: Array[Byte]): Row = {
    import spark.implicits._
    Seq(Tuple1(payload)).toDF("media")
      .select(Multimodal.parseWavHeader(col("media")).as("m"))
      .select("m.format", "m.channels", "m.sample_rate", "m.bits_per_sample",
        "m.n_samples", "m.duration_ms")
      .head()
  }

  test("parseWavHeader decodes a canonical 44-byte-header PCM wav") {
    // RIFF/WAVE, fmt (PCM, mono, 8 kHz, 16-bit, blockAlign 2,
    // byteRate 16000), data = 8 bytes → 4 samples, 0 ms (floor)
    val wav = hexToBytes(
      "52494646" + "2c000000" + "57415645" +
        "666d7420" + "10000000" + "0100" + "0100" + "401f0000" +
        "803e0000" + "0200" + "1000" +
        "64617461" + "08000000" + "0011223344556677")
    assert(parseWav(wav) === Row("wav", 1L, 8000L, 16L, 4L, 0L))
  }

  test("parseWavHeader walks past an odd-length LIST chunk (even-padding rule)") {
    // LIST chunk carries 5 payload bytes ("INFO" + 1) + 1 pad byte; a
    // parser that forgets RIFF's pad-to-even lands mid-chunk and finds
    // no fmt — only the padded walk decodes this file
    val wav = hexToBytes(
      "52494646" + "3a000000" + "57415645" +
        "4c495354" + "05000000" + "494e464f" + "58" + "00" +
        "666d7420" + "10000000" + "0100" + "0200" + "80bb0000" +
        "00ee0200" + "0400" + "1000" +
        "64617461" + "0c000000" + "000000000000000000000000")
    // stereo 48 kHz 16-bit, 12 data bytes → 3 samples, floor(12000/192000)=0 ms
    assert(parseWav(wav) === Row("wav", 2L, 48000L, 16L, 3L, 0L))
  }

  test("parseWavHeader: garbage, truncated and non-RIFF payloads are unknown") {
    assert(parseWav("definitely not audio".getBytes("UTF-8")).getString(0) === "unknown")
    assert(parseWav(Array.emptyByteArray).getString(0) === "unknown")
    // RIFF magic but truncated before any chunk fits
    assert(parseWav(hexToBytes("524946460400000057415645")).getString(0) === "unknown")
  }

  private def parseAvi(payload: Array[Byte]): Row = {
    import spark.implicits._
    Seq(Tuple1(payload)).toDF("media")
      .select(Multimodal.parseAviHeader(col("media")).as("m"))
      .select("m.format", "m.width", "m.height", "m.n_frames", "m.n_streams",
        "m.micro_sec_per_frame", "m.duration_ms")
      .head()
  }

  test("parseAviHeader decodes a hand-built RIFF/'AVI ' with a JUNK chunk before hdrl") {
    // RIFF/AVI, 3-byte JUNK (+1 pad), LIST/hdrl with a 56-byte avih:
    // 320x240, 100 frames, 1 stream, 33333 us/frame -> 3333 ms
    val avi = hexToBytes(
      "52494646" + "66000000" + "41564920" +
        "4a554e4b" + "03000000" + "aabbcc" + "00" +
        "4c495354" + "44000000" + "6864726c" +
        "61766968" + "38000000" +
        "35820000" + "00000000" + "00000000" + "10000000" + // mspf=33333
        "64000000" + "00000000" + "01000000" + "00000000" + // frames=100, streams=1
        "40010000" + "f0000000" +                            // w=320, h=240
        "00000000" + "00000000" + "00000000" + "00000000" +
        "4c495354" + "04000000" + "6d6f7669")
    assert(parseAvi(avi) === Row("avi", 320L, 240L, 100L, 1L, 33333L, 3333L))
  }

  test("parseAviHeader: garbage and non-AVI RIFF payloads are unknown") {
    assert(parseAvi("not a video".getBytes("UTF-8")).getString(0) === "unknown")
    // a valid WAV is RIFF but not 'AVI ' — must not parse as avi
    val wav = hexToBytes(
      "52494646" + "2c000000" + "57415645" +
        "666d7420" + "10000000" + "0100" + "0100" + "401f0000" +
        "803e0000" + "0200" + "1000" + "64617461" + "08000000" + "0011223344556677")
    assert(parseAvi(wav).getString(0) === "unknown")
  }

  test("syntheticAvi round-trips through parseAviHeader") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc body $i")).toDF("doc_id", "text")
    val parsed = Multimodal.syntheticAvi(docs)
      .select(col("media_id"), Multimodal.parseAviHeader(col("media")).as("m"))
      .select(col("media_id"), col("m.format"), col("m.width"), col("m.height"),
        col("m.n_frames"), col("m.n_streams"))
      .collect()
    assert(parsed.length === 200)
    parsed.foreach { r =>
      val id = r.getLong(0)
      if (id % 83 == 0) {
        assert(r.getString(1) === "unknown", s"id=$id")
      } else {
        assert(r.getString(1) === "avi", s"id=$id")
        assert(r.getLong(2) === 160 + id % 1280, s"width id=$id")
        assert(r.getLong(3) === 120 + (id * 3) % 720, s"height id=$id")
        assert(r.getLong(4) === 10 + id % 990, s"frames id=$id")
        assert(r.getLong(5) === 1 + id % 2, s"streams id=$id")
      }
    }
  }

  test("syntheticWav round-trips through parseWavHeader") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc body $i")).toDF("doc_id", "text")
    val parsed = Multimodal.syntheticWav(docs)
      .select(col("media_id"), Multimodal.parseWavHeader(col("media")).as("m"))
      .select(col("media_id"), col("m.format"), col("m.channels"),
        col("m.sample_rate"), col("m.bits_per_sample"), col("m.n_samples"))
      .collect()
    assert(parsed.length === 200)
    parsed.foreach { r =>
      val id = r.getLong(0)
      if (id % 89 == 0) {
        assert(r.getString(1) === "unknown", s"id=$id")
      } else {
        val ch = 1 + id % 2
        val bytesPer = if (id % 5 < 2) 1L else 2L
        val sr = (id % 3) match { case 0 => 8000L; case 1 => 16000L; case _ => 44100L }
        assert(r.getString(1) === "wav", s"id=$id")
        assert(r.getLong(2) === ch, s"channels id=$id")
        assert(r.getLong(3) === sr, s"rate id=$id")
        assert(r.getLong(4) === bytesPer * 8, s"bits id=$id")
        assert(r.getLong(5) === (id % 9 + 8) / (ch * bytesPer), s"samples id=$id")
      }
    }
  }

  private def parseMp4(payload: Array[Byte]): Row = {
    import spark.implicits._
    Seq(Tuple1(payload)).toDF("media")
      .select(Multimodal.parseMp4Header(col("media")).as("m"))
      .select("m.format", "m.major_brand_hex", "m.timescale", "m.duration",
        "m.duration_ms")
      .head()
  }

  test("parseMp4Header walks ftyp → free → moov and reads mvhd v0") {
    // ftyp(isom) + a 3-byte 'free' box (shifts moov) + moov/mvhd:
    // timescale 600, duration 1500 → 2500 ms
    val mvhdTail = "00010000" + "0100" + "0000" + "0" * 16 +
      "000100000000000000000000" + "000000000001000000000000" +
      "000000000000000040000000" + "0" * 48 + "00000002"
    val mp4 = hexToBytes(
      "00000010" + "66747970" + "69736F6D" + "00000000" +
        "0000000B" + "66726565" + "AABBCC" +
        "00000074" + "6D6F6F76" +
        "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
        "00000258" + "000005DC" + mvhdTail)
    assert(parseMp4(mp4) === Row("mp4", "69736F6D", 600L, 1500L, 2500L))
  }

  test("pcmChannelStats: hand-computed samples of a 16-bit stereo wav") {
    import spark.implicits._
    // stereo 16-bit, 2 frames: L = [256, -2], R = [-256, 513]
    // LE samples: 0001 → 256, 00FF → 0xFF00=65280 → -256,
    //             FEFF → 0xFFFE=65534 → -2, 0102 → 0x0201=513
    val wav = hexToBytes(
      "52494646" + "2c000000" + "57415645" +
        "666d7420" + "10000000" + "0100" + "0200" + "80bb0000" +
        "00ee0200" + "0400" + "1000" +
        "64617461" + "08000000" + "0001" + "00ff" + "feff" + "0102")
    val r = Seq(Tuple1(wav)).toDF("media")
      .select(col("media"), Multimodal.parseWavPcm(col("media")).as("p"))
      .select(col("media"), col("p.valid").as("valid"), col("p.channels").as("ch"),
        col("p.bits_per_sample").as("bits"), col("p.n_frames").as("nf"),
        col("p.doff").as("doff"))
      .select(Multimodal.pcmChannelStats(col("media"), col("doff"),
        col("ch"), col("bits"), col("nf")).as("st"))
      .select("st.sum_ch0", "st.sum_ch1", "st.peak_ch0", "st.peak_ch1",
        "st.mean_ch0", "st.mean_ch1", "st.rms_ch0", "st.rms_ch1")
      .head()
    assert(r.getLong(0) === 254L)   // 256 + (-2)
    assert(r.getLong(1) === 257L)   // -256 + 513
    assert(r.getLong(2) === 256L)
    assert(r.getLong(3) === 513L)
    assert(r.getDouble(4) === 127.0)
    assert(r.getDouble(5) === 128.5)
    assert(r.getDouble(6) === math.rint(math.sqrt((256.0 * 256 + 4) / 2) * 1e6) / 1e6)
  }

  test("bmpChannelStats: stride padding never enters the sums") {
    import spark.implicits._
    // 1x2 bottom-up 24-bit BMP: stride 4 → 1 pad byte per row set to
    // 0xEE — if the pad leaked into any channel sum, sums would shift
    // row0 (bottom): B=10 G=20 R=30, pad EE; row1: B=1 G=2 R=3, pad EE
    val bmp = hexToBytes(
      "424d" + "3e000000" + "00000000" + "36000000" +
        "28000000" + "01000000" + "02000000" + "0100" + "1800" +
        "00000000" + "08000000" + "130b0000" + "130b0000" +
        "00000000" + "00000000" +
        "0a141e" + "ee" + "010203" + "ee")
    val r = Seq(Tuple1(bmp)).toDF("media")
      .select(col("media"), Multimodal.parseBmp(col("media")).as("p"))
      .select(col("media"), col("p.valid").as("valid"), col("p.width").as("w"),
        col("p.height").as("h"), col("p.data_off").as("doff"))
      .select(col("valid"), Multimodal.bmpChannelStats(col("media"),
        col("doff"), col("w"), col("h")).as("st"))
      .select(col("valid"), col("st.sum_b"), col("st.sum_g"), col("st.sum_r"),
        col("st.mean_g"), col("st.var_g"))
      .head()
    assert(r.getBoolean(0))
    assert(r.getLong(1) === 11L && r.getLong(2) === 22L && r.getLong(3) === 33L)
    assert(r.getDouble(4) === 11.0)          // (20 + 2) / 2
    assert(r.getDouble(5) === 81.0)          // E[g²] − mean² = 202 − 121
  }

  test("decodeMediaFeatures ≡ the expression path on the synthetic WAV corpus") {
    import spark.implicits._
    val docs = (0L until 150L).map(i => (i, s"doc body $i")).toDF("doc_id", "text")
    val wavs = Multimodal.syntheticWav(docs)
    // expression side: per-channel mean/rms/peak normalized to full scale
    val expr = wavs
      .select(col("media_id"), col("media"), Multimodal.parseWavPcm(col("media")).as("p"))
      .select(col("media_id"), col("media"), col("p.valid").as("valid"),
        col("p.channels").as("ch"), col("p.bits_per_sample").as("bits"),
        col("p.n_frames").as("nf"), col("p.doff").as("doff"))
      .filter(col("valid"))
      .select(col("media_id"), col("ch"), col("bits"),
        Multimodal.pcmChannelStats(col("media"), col("doff"), col("ch"),
          col("bits"), col("nf")).as("st"))
      .collect().map { r =>
        val fs = if (r.getLong(2) == 8L) 128f else 32768f
        val st = r.getStruct(3)
        val chN = r.getLong(1).toInt
        val feats = (0 until chN).flatMap { c =>
          val (s, p, m, q) =
            if (c == 0) (st.getLong(0), st.getLong(2), st.getDouble(4), st.getDouble(6))
            else (st.getLong(1), st.getLong(3), st.getDouble(5), st.getDouble(7))
          // mean and rms are rounded to 6dp in the expression path;
          // compare at 5dp to absorb that quantization
          Seq((m / fs).toFloat, (q / fs).toFloat, p.toFloat / fs)
        }
        r.getLong(0) -> feats
      }.toMap
    val jvm = Multimodal.extractFeatures(wavs, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(expr.nonEmpty)
    expr.foreach { case (id, feats) =>
      feats.zipWithIndex.foreach { case (f, i) =>
        assert(math.abs(jvm(id)(i) - f) < 1e-4f, s"id=$id feat=$i")
      }
    }
  }

  test("decodeMediaFeatures ≡ the expression path on the synthetic BMP corpus") {
    import spark.implicits._
    val docs = (0L until 150L).map(i => (i, s"doc body $i")).toDF("doc_id", "text")
    val bmps = Multimodal.syntheticBmp(docs)
    val expr = bmps
      .select(col("media_id"), col("media"), Multimodal.parseBmp(col("media")).as("p"))
      .select(col("media_id"), col("media"), col("p.valid").as("valid"),
        col("p.width").as("w"), col("p.height").as("h"),
        col("p.data_off").as("doff"))
      .filter(col("valid"))
      .select(col("media_id"), Multimodal.bmpChannelStats(col("media"),
        col("doff"), col("w"), col("h")).as("st"))
      .collect().map { r =>
        val st = r.getStruct(1)
        // (sum_b, mean_b, var_b, sum_g, ...) → [mean/255, stddev/255] per channel
        val feats = (0 until 3).flatMap { c =>
          val mean = st.getDouble(3 * c + 1)
          val v = st.getDouble(3 * c + 2)
          Seq((mean / 255.0).toFloat, (math.sqrt(math.max(0.0, v)) / 255.0).toFloat)
        }
        r.getLong(0) -> feats
      }.toMap
    val jvm = Multimodal.extractFeatures(bmps, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(expr.nonEmpty)
    expr.foreach { case (id, feats) =>
      feats.zipWithIndex.foreach { case (f, i) =>
        assert(math.abs(jvm(id)(i) - f) < 1e-4f, s"id=$id feat=$i")
      }
    }
  }

  test("decodeMediaFeatures falls back to the labeled stub for non-decodable payloads") {
    val junk = "definitely not media".getBytes("UTF-8")
    assert(Multimodal.decodeMediaFeatures(junk, 8).toSeq ===
      Multimodal.stubDecodeFeatures(junk, 8).toSeq)
  }

  test("parseMp4Header: garbage, truncated and versionless payloads are unknown") {
    assert(parseMp4("not a movie".getBytes).getString(0) === "unknown")
    assert(parseMp4(hexToBytes("0000001066747970")).getString(0) === "unknown")
    // a moov whose first child is NOT mvhd must not parse
    val noMvhd = hexToBytes(
      "00000010" + "66747970" + "69736F6D" + "00000000" +
        "00000010" + "6D6F6F76" + "00000008" + "75647461") // moov/udta
    assert(parseMp4(noMvhd).getString(0) === "unknown")
  }

  test("pcmSsq0 is container-invariant: LIST chunk and RIFF size don't matter") {
    import spark.implicits._
    // identical mono 8-bit PCM payload (samples 0x00,0x80,0xFF,0x40 →
    // centered -128, 0, 127, -64 → ssq = 16384 + 0 + 16129 + 4096)
    val fmtData = "666d7420" + "10000000" + "0100" + "0100" + "401f0000" +
      "401f0000" + "0100" + "0800" +
      "64617461" + "04000000" + "0080ff40"
    val plain = hexToBytes("52494646" + "24000000" + "57415645" + fmtData)
    val withList = hexToBytes("52494646" + "34000000" + "57415645" +
      "4c495354" + "08000000" + "494e464f" + "deadbeef" + fmtData)
    def ssq(payload: Array[Byte]): Long =
      Seq(Tuple1(payload)).toDF("media")
        .select(col("media"), Multimodal.parseWavPcm(col("media")).as("p"))
        .select(Multimodal.pcmSsq0(col("media"), col("p.doff"),
          col("p.channels"), col("p.bits_per_sample"),
          col("p.n_frames")).as("ssq"), col("p.valid").as("valid"))
        .collect().map { r => assert(r.getBoolean(1)); r.getLong(0) }.head
    assert(ssq(plain) === 16384L + 0L + 16129L + 4096L)
    assert(ssq(withList) === ssq(plain),
      "the decoded-content fingerprint must see through RIFF framing")
  }
}

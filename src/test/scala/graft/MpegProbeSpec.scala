package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.expressions.MpegProbe
import graft.multimodal.Multimodal

/** Pins for the MPEG-audio frame-header walk
  * ([[graft.expressions.MpegProbe]]). q232 is the oracle-checked path
  * for the header tables, frame-length arithmetic, CBR duration, Xing
  * and ID3v2 geometry; this spec owns what the synthetic corpus
  * doesn't exercise: VBRI, the Info tag, the ID3v1 "TAG" trailer,
  * free-format bitrate, sync scan failures, VBR bitrate switching
  * (cbr=false), and dirty-byte totality. Frames here are hand-built
  * from the published tables — the test-side ground truth. */
class MpegProbeSpec extends SparkSpec {

  /** One MPEG1 Layer III frame: bitrate index, samplerate index,
    * padding, channel mode; body zero-filled to the public length
    * arithmetic, with optional byte overrides at given frame
    * offsets. */
  private def v1l3Frame(bri: Int, sri: Int, pad: Int = 0,
                        mono: Boolean = false,
                        patch: Map[Int, Array[Byte]] = Map.empty): Array[Byte] = {
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)(bri)
    val sr = Array(44100, 48000, 32000)(sri)
    val len = 144 * kbps * 1000 / sr + pad
    val f = new Array[Byte](len)
    f(0) = 0xff.toByte
    f(1) = 0xfb.toByte
    f(2) = ((bri << 4) | (sri << 2) | (pad << 1)).toByte
    f(3) = (if (mono) 0xc0 else 0x00).toByte
    patch.foreach { case (off, b) => System.arraycopy(b, 0, f, off, b.length) }
    f
  }

  private def probe(bytes: Array[Byte]): Row = {
    import spark.implicits._
    Seq(bytes).toDF("media")
      .select(Multimodal.mpegProbe(col("media")).as("d"))
      .select("d.*").collect()(0)
  }

  test("VBRI header detected at fixed offset 36 with its frame count") {
    val frames = 7777
    val vbri = "VBRI".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 0, 0, 0, 0) ++ // version, delay, quality
      Array[Byte](0, 0, 16, 0) ++       // bytes
      Array((frames >> 24).toByte, (frames >> 16).toByte,
        (frames >> 8).toByte, frames.toByte)
    val f1 = v1l3Frame(10, 0, mono = false, patch = Map(36 -> vbri))
    val r = probe(f1 ++ v1l3Frame(10, 0) ++ v1l3Frame(10, 0))
    assert(r.getAs[Boolean]("valid"))
    assert(r.getAs[String]("vbr_tag") === "vbri")
    assert(r.getAs[Long]("vbr_frames") === frames.toLong)
    assert(r.getAs[Long]("n_frames") === 3L)
  }

  test("Info tag (CBR LAME header) surfaces as vbr_tag=info; stereo side info 32") {
    // stereo V1 L3 → side info 32 → tag at 4 + 32
    val info = "Info".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 1) ++ Array[Byte](0, 0, 1, 44) // flags, frames=300
    val f1 = v1l3Frame(10, 0, patch = Map(36 -> info))
    val r = probe(f1 ++ v1l3Frame(10, 0))
    assert(r.getAs[String]("vbr_tag") === "info")
    assert(r.getAs[Long]("vbr_frames") === 300L)
  }

  test("ID3v1 TAG trailer ends the walk cleanly as trailing bytes") {
    val tag = new Array[Byte](128)
    System.arraycopy("TAG".getBytes("US-ASCII"), 0, tag, 0, 3)
    val r = probe(v1l3Frame(5, 1) ++ v1l3Frame(5, 1) ++ tag)
    assert(r.getAs[Boolean]("valid"))
    assert(r.getAs[Long]("n_frames") === 2L)
    assert(r.getAs[Long]("trailing_bytes") === 128L)
  }

  test("VBR stream: bitrate switches per frame, cbr=false, first frame's kbps") {
    val r = probe(v1l3Frame(10, 0) ++ v1l3Frame(14, 0) ++ v1l3Frame(3, 0))
    assert(r.getAs[Boolean]("valid"))
    assert(!r.getAs[Boolean]("cbr"))
    assert(r.getAs[Int]("bitrate_kbps") === 160) // index 10, first frame
    assert(r.getAs[Long]("n_frames") === 3L)
    // duration counts frames regardless of their bitrates
    assert(r.getAs[Long]("duration_ms") === 3L * 1152 * 1000 / 44100)
  }

  test("free-format bitrate (index 0) and reserved fields census as headers") {
    val free = v1l3Frame(10, 0)
    free(2) = 0x00 // bitrate index 0 (free), sri 0
    assert(probe(free).getAs[String]("reason") === "bad_header")
    val reservedLayer = v1l3Frame(10, 0)
    reservedLayer(1) = 0xf9.toByte // layer bits 00 = reserved
    assert(probe(reservedLayer).getAs[String]("reason") === "bad_header")
    val reservedVersion = v1l3Frame(10, 0)
    reservedVersion(1) = 0xeb.toByte // version bits 01 = reserved
    assert(probe(reservedVersion).getAs[String]("reason") === "bad_header")
  }

  test("no sync / too short / junk census; mid-stream drift ends walk cleanly") {
    assert(probe("not an mpeg stream at all".getBytes("US-ASCII"))
      .getAs[String]("reason") === "no_sync")
    assert(probe(Array[Byte](0x12, 0x34)).getAs[String]("reason") === "too_short")
    // a consistent prefix then a DIFFERENT samplerate header: the walk
    // ends at the drift point and reports the tail, still valid
    val drift = v1l3Frame(10, 0) ++ v1l3Frame(10, 1)
    val r = probe(drift)
    assert(r.getAs[Boolean]("valid"))
    assert(r.getAs[Long]("n_frames") === 1L)
    assert(r.getAs[Long]("trailing_bytes") === v1l3Frame(10, 1).length.toLong)
  }

  test("probe is total on hostile bytes (never throws, always censuses)") {
    val hostile = Seq(
      Array.fill[Byte](64)(0xff.toByte),            // wall of sync words
      "ID3".getBytes ++ Array.fill[Byte](7)(0x7f),  // tag size past end
      Array[Byte](0xff.toByte, 0xfb.toByte, 0xf0.toByte, 0x00), // bri 15
      new Array[Byte](0))
    hostile.foreach { b =>
      val r = probe(b)
      assert(!r.getAs[Boolean]("valid") && r.getAs[String]("reason") != null)
    }
    // wall-of-0xff: sync matches but the bitrate index is 15 (bad) —
    // the header gate censuses before any length arithmetic runs
    assert(probe(Array.fill[Byte](64)(0xff.toByte))
      .getAs[String]("reason") === "bad_header")
  }

  test("MaxFrames bomb guard bounds the walk") {
    assert(MpegProbe.MaxFrames <= (1L << 24))
  }
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MPEG-audio (MP1/MP2/MP3) FRAME-HEADER walk — metadata census only,
  * no sample reconstruction. Everything here is pure public-spec
  * integer parsing (ISO/IEC 11172-3 / 13818-3 header layout, the
  * published bitrate/samplerate tables, and the de-facto Xing/Info and
  * VBRI VBR-header layouts), so the labeled decode stub
  * ([[graft.multimodal.Multimodal.stubDecodeFeatures]]) shrinks to
  * MP3/AAC SAMPLE reconstruction only — the part that genuinely needs
  * a codec the JDK doesn't ship.
  *
  * The walk (cf. the reference's byte-census treatment of opaque media,
  * /root/reference/src/etl.py — it never decodes either):
  *  - optional ID3v2 tag skip (syncsafe size). Deliberate limitation:
  *    exactly ONE leading tag is skipped and a valid frame sync must
  *    follow immediately — stacked ID3v2 tags or junk bytes before the
  *    first sync (both produced by real-world re-taggers) census as
  *    no_sync/bad_header rather than being walked. That is the right
  *    strictness for a validity census (the decode family keys on the
  *    same gate); a forgiving real-corpus walker would loop the tag
  *    skip and bounded-forward-scan for sync before giving up;
  *  - 11-bit sync + version/layer/bitrate-index/samplerate-index/
  *    padding/channel-mode parse per frame; frame length from the
  *    public arithmetic (L1: (12·br/sr + pad)·4, L2 & L3-V1:
  *    144·br/sr + pad, L3-V2/2.5: 72·br/sr + pad);
  *  - frames are walked while headers stay consistent (same
  *    version/layer/samplerate); bitrate MAY vary per frame (VBR) and
  *    `cbr` reports whether it did;
  *  - CBR duration estimate: walked_frames × samples_per_frame ×
  *    1000 / rate in integer ms — exact, replayable in any engine;
  *  - Xing/Info (first frame, after the layer-III side info) and VBRI
  *    (fixed offset 36) VBR headers surface as `vbr_tag` +
  *    `vbr_frames` when the frames flag is set;
  *  - a stream ending mid-frame censuses `trunc_frame` with every
  *    field of the walked prefix surfaced (the census-total-over-
  *    dirty-bytes discipline); a tail that is not a consistent next
  *    header (ID3v1 "TAG" block, junk) ends the walk cleanly and is
  *    reported as `trailing_bytes`.
  *
  * Fused single-pass, one static JVM call → stays inside whole-stage
  * codegen; bomb guard caps the frame count (a 4 KB declared frame
  * can't make the walk superlinear, but a hostile length-0 loop must
  * be impossible — lengths below the 4-byte header reject as
  * `bad_header`).
  */
object MpegProbe {
  /** Walked-frame cap: above this the stream censuses as
    * `too_many_frames` (≈ 12 h of audio at the shortest frame). */
  val MaxFrames: Long = 1L << 22

  val schema: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("reason", StringType),
    StructField("version", StringType),
    StructField("layer", IntegerType),
    StructField("bitrate_kbps", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("cbr", BooleanType),
    StructField("n_frames", LongType),
    StructField("frame_bytes", LongType),
    StructField("duration_ms", LongType),
    StructField("vbr_tag", StringType),
    StructField("vbr_frames", LongType),
    StructField("trailing_bytes", LongType)))

  // Published bitrate tables, kbps, index 1..14 (0 = free, 15 = bad).
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288,
    320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160,
    192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320)
  private val BrV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144,
    160, 176, 192, 224, 256)
  private val BrV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 144, 160)
  // Samplerate tables, index 0..2 (3 = reserved).
  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  /** Parsed header: (versionBits, layer 1-3, bitrate kbps, rate Hz,
    * padding, channels, frameLen bytes, crc). versionBits: 3 = MPEG1,
    * 2 = MPEG2, 0 = MPEG2.5. Returns null on any reserved/invalid
    * field combination or a free-format bitrate. */
  private final class Header(val ver: Int, val layer: Int, val kbps: Int,
                             val rate: Int, val channels: Int,
                             val frameLen: Int, val crc: Boolean)

  private def parseHeader(bytes: Array[Byte], pos: Int): Header = {
    if (pos + 4 > bytes.length) return null
    val b0 = bytes(pos) & 0xff; val b1 = bytes(pos + 1) & 0xff
    val b2 = bytes(pos + 2) & 0xff; val b3 = bytes(pos + 3) & 0xff
    if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return null
    val ver = (b1 >> 3) & 3            // 0=2.5, 1=reserved, 2=2, 3=1
    val layerBits = (b1 >> 1) & 3      // 0=reserved, 1=III, 2=II, 3=I
    if (ver == 1 || layerBits == 0) return null
    val layer = 4 - layerBits          // 1, 2, 3
    val bri = (b2 >> 4) & 0xf
    val sri = (b2 >> 2) & 3
    if (bri == 0 || bri == 15 || sri == 3) return null
    val kbps = (ver, layer) match {
      case (3, 1) => BrV1L1(bri)
      case (3, 2) => BrV1L2(bri)
      case (3, 3) => BrV1L3(bri)
      case (_, 1) => BrV2L1(bri)
      case _ => BrV2L23(bri)
    }
    val rate = ver match {
      case 3 => SrV1(sri)
      case 2 => SrV2(sri)
      case _ => SrV25(sri)
    }
    val pad = (b2 >> 1) & 1
    val channels = if (((b3 >> 6) & 3) == 3) 1 else 2
    val frameLen =
      if (layer == 1) (12 * kbps * 1000 / rate + pad) * 4
      else if (layer == 2 || ver == 3) 144 * kbps * 1000 / rate + pad
      else 72 * kbps * 1000 / rate + pad
    if (frameLen < 4) return null
    new Header(ver, layer, kbps, rate, channels, frameLen, (b1 & 1) == 0)
  }

  /** Samples per frame from the public tables. */
  private def samplesPerFrame(ver: Int, layer: Int): Int =
    if (layer == 1) 384
    else if (layer == 2) 1152
    else if (ver == 3) 1152 else 576

  def probeToRow(bytes: Array[Byte]): InternalRow = {
    def row(valid: Boolean, reason: String, h: Header, cbr: java.lang.Boolean,
            frames: Long, frameBytes: Long, durMs: Long, vbrTag: String,
            vbrFrames: Long, trailing: Long): InternalRow = {
      val r = new GenericInternalRow(14)
      r.update(0, valid)
      r.update(1, if (reason == null) null else UTF8String.fromString(reason))
      if (h != null) {
        r.update(2, UTF8String.fromString(
          if (h.ver == 3) "1" else if (h.ver == 2) "2" else "2.5"))
        r.update(3, h.layer)
        r.update(4, h.kbps)
        r.update(5, h.rate)
        r.update(6, h.channels)
      }
      if (cbr != null) r.update(7, cbr.booleanValue())
      if (frames >= 0) {
        r.update(8, frames)
        r.update(9, frameBytes)
        r.update(10, durMs)
      }
      if (vbrTag != null) r.update(11, UTF8String.fromString(vbrTag))
      if (vbrFrames >= 0) r.update(12, vbrFrames)
      if (trailing >= 0) r.update(13, trailing)
      r
    }
    def fail(reason: String, h: Header = null, frames: Long = -1L,
             frameBytes: Long = -1L, durMs: Long = -1L, cbr: java.lang.Boolean = null,
             vbrTag: String = null, vbrFrames: Long = -1L,
             trailing: Long = -1L): InternalRow =
      row(valid = false, reason, h, cbr, frames, frameBytes, durMs,
        vbrTag, vbrFrames, trailing)
    try {
      if (bytes == null || bytes.length < 4) return fail("too_short")
      def tag(i: Int, s: String): Boolean =
        i + s.length <= bytes.length &&
          (0 until s.length).forall(k => (bytes(i + k) & 0xff) == s.charAt(k))
      def be(i: Int, n: Int): Long = {
        var v = 0L; var k = 0
        while (k < n) { v = (v << 8) | (bytes(i + k) & 0xff); k += 1 }
        v
      }
      var pos = 0
      // ID3v2: "ID3" + version(2) + flags(1) + syncsafe size(4); the
      // size excludes the 10-byte header (footer flag adds 10 more).
      // A tag cut inside its own 10-byte header is the same corruption
      // class as one cut inside its payload — census both as trunc_tag
      // (falling through would misread the 'I' as no_sync)
      if (tag(0, "ID3") && bytes.length < 10) return fail("trunc_tag")
      if (tag(0, "ID3")) {
        val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
          ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
        val footer = (bytes(5) & 0x10) != 0
        pos = 10 + size + (if (footer) 10 else 0)
        if (pos + 4 > bytes.length) return fail("trunc_tag")
      }
      val first = parseHeader(bytes, pos)
      if (first == null) {
        if (pos + 2 <= bytes.length && (bytes(pos) & 0xff) == 0xff &&
            (bytes(pos + 1) & 0xe0) == 0xe0)
          return fail("bad_header")
        return fail("no_sync")
      }
      // VBR headers live in the FIRST frame only: Xing/Info after the
      // layer-III side info (and the 2-byte CRC when protected), VBRI
      // at fixed offset 36 from the header
      var vbrTag: String = null
      var vbrFrames = -1L
      if (first.layer == 3) {
        val side =
          if (first.ver == 3) { if (first.channels == 1) 17 else 32 }
          else { if (first.channels == 1) 9 else 17 }
        // every read stays inside the FIRST frame as well as the
        // stream: a tag whose frames field crosses the frame boundary
        // would otherwise read its count from the next frame's sync
        // bytes (MPEG2 mono L3 at 8 kbps has frameLen 24 and
        // xOff = pos + 13 — the 4-byte count ends at 25)
        val frameEnd = pos + first.frameLen
        val xOff = pos + 4 + (if (first.crc) 2 else 0) + side
        if (xOff + 8 <= bytes.length && xOff + 8 <= frameEnd &&
            (tag(xOff, "Xing") || tag(xOff, "Info"))) {
          vbrTag = if (tag(xOff, "Xing")) "xing" else "info"
          val flags = be(xOff + 4, 4)
          if ((flags & 1L) != 0 && xOff + 12 <= bytes.length &&
              xOff + 12 <= frameEnd)
            vbrFrames = be(xOff + 8, 4)
        } else if (pos + 54 <= frameEnd && pos + 54 <= bytes.length &&
            tag(pos + 36, "VBRI")) {
          vbrTag = "vbri"
          vbrFrames = be(pos + 50, 4)
        }
      }
      var frames = 0L
      var frameBytes = 0L
      var cbr = true
      var trailing = 0L
      var truncated = false
      var done = false
      while (!done) {
        val h = if (pos + 4 <= bytes.length) parseHeader(bytes, pos) else null
        if (h == null ||
            h.ver != first.ver || h.layer != first.layer ||
            h.rate != first.rate) {
          // not a consistent next header: ID3v1 "TAG" block or junk
          // tail — the walk ends cleanly and the tail is surfaced
          trailing = bytes.length - pos.toLong
          done = true
        } else if (pos + h.frameLen > bytes.length) {
          truncated = true
          trailing = bytes.length - pos.toLong
          done = true
        } else {
          if (h.kbps != first.kbps) cbr = false
          frames += 1
          frameBytes += h.frameLen
          pos += h.frameLen
          if (frames > MaxFrames) return fail("too_many_frames", first)
        }
      }
      if (frames == 0) return fail("trunc_frame", first, frames = 0L,
        frameBytes = 0L, durMs = 0L, cbr = null, vbrTag = vbrTag,
        vbrFrames = vbrFrames, trailing = trailing)
      val durMs = frames * samplesPerFrame(first.ver, first.layer) * 1000L /
        first.rate
      if (truncated)
        fail("trunc_frame", first, frames, frameBytes, durMs, cbr,
          vbrTag, vbrFrames, trailing)
      else
        row(valid = true, null, first, cbr, frames, frameBytes, durMs,
          vbrTag, vbrFrames, trailing)
    } catch {
      // belt-and-braces totality (the PngDecode discipline): any slip
      // in the bounds reasoning must census, not fail the task
      case _: Exception => fail("corrupt")
    }
  }
}

case class MpegProbeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = MpegProbe.schema
  override def prettyName: String = "mpeg_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    MpegProbe.probeToRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.expressions.MpegProbe.probeToRow($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MpegExpressions {
  def mpeg_probe(media: Column): Column =
    ColumnBridge.column(MpegProbeExpr(ColumnBridge.expression(media)))
}

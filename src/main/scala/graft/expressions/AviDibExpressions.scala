package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Uncompressed-DIB video frame decode inside an AVI container — REAL
  * pixel-sample decode for the one video payload that needs no codec:
  * `'##db'` stream chunks whose BITMAPINFOHEADER declares
  * biCompression = 0 / BI_RGB are raw bottom-up 24-bit pixel rows with
  * 4-byte stride padding, exactly the BMP pixel array
  * ([[graft.multimodal.Multimodal.bmpChannelStats]]) carried per frame
  * in a RIFF chunk stream. Everything here is pure public spec
  * (OpenDML / MSDN AVIMAINHEADER, AVISTREAMHEADER, BITMAPINFOHEADER
  * and the RIFF even-padding rule — cf. the reference's byte-census
  * treatment of opaque media, /root/reference/src/etl.py, which
  * never decodes at all), so the labeled decode stub shrinks to
  * genuinely COMPRESSED video codecs plus MP3/AAC samples.
  *
  * The walk:
  *  - RIFF/'AVI ' preamble, then the top-level chunk walk (skipping
  *    JUNK and anything else, sizes padded to even) to LIST/'hdrl';
  *  - inside hdrl: past the mandatory 'avih', to the first LIST/'strl'
  *    whose 'strh' declares fccType 'vids'; its 'strf' is the
  *    BITMAPINFOHEADER — biWidth/biHeight/biPlanes/biBitCount/
  *    biCompression at the published offsets (all little-endian);
  *  - gates, in claim order: biCompression ≠ 0 censuses `compressed`
  *    (the codec boundary — these frames go to the stub), biBitCount ≠
  *    24 `unsupported_depth`, non-positive or over-cap dimensions
  *    `bad_dims`;
  *  - then the top-level walk continues to LIST/'movi' and every
  *    `'##db'` child (two stream digits + "db") is decoded: declared
  *    size must be exactly stride·height for stride = ⌈3w/4⌉·4
  *    (`bad_frame_size` otherwise), rows walked stride-aware so the
  *    0–3 pad bytes per row NEVER enter the statistics — exact BIGINT
  *    per-channel (B, G, R) sums and sums of squares, fused across
  *    frames. Non-frame children ('##wb' audio, '##dc' compressed,
  *    rec LISTs) are skipped by the same padded walk;
  *  - a chunk header or frame payload crossing the end of the buffer
  *    censuses `trunc_frame` (dims and the walked-frame count
  *    surfaced, statistics withheld — a truncated frame means the sums
  *    no longer describe `n_frames` complete frames);
  *  - `valid` requires ≥ 1 complete DIB frame (`no_frames` otherwise).
  *
  * Bottom-up row order is physically honored by the stride walk but is
  * deliberately NOT observable in the output: per-channel sums are
  * row-permutation-invariant, which is what lets a cross-engine oracle
  * replay the statistics from the pixel FORMULA without byte access
  * (q236). Per-byte addressing correctness (the stride map) IS
  * observable: pad bytes carry a poison value in the synthetic corpus,
  * so a contiguous reader cannot hash-match.
  *
  * Cost is O(buffer length): every loop advances through bytes that
  * are physically present (≥ 8 per chunk, declared sizes bounds-checked
  * before use), so no declared-length bomb can make the walk
  * superlinear. One static JVM call → stays inside whole-stage
  * codegen. */
/** Shared RIFF/AVI header walk for [[AviDibProbe]] and
  * [[AviMjpegProbe]]: top-level chunk walk to LIST/'hdrl' and
  * LIST/'movi', then inside hdrl to the first 'vids' stream's 'strf'
  * BITMAPINFOHEADER. Pure bounds-checked byte reads; every loop
  * advances ≥ 8 bytes, so cost is O(buffer). */
private[expressions] object AviWalk {
  /** Parsed header: strf fields (w/h/bits/comp, meaningful only when
    * `hasStrf`) and the movi payload span (movi = -1 when absent).
    * Presence is a SEPARATE boolean, not a w-sentinel: biWidth is a
    * signed-truncated le32, so a header declaring biWidth ≥ 2³¹ reads
    * NEGATIVE — it must census `bad_dims` (the dims gate), never
    * masquerade as "no 'vids' strf". */
  final case class Hdr(hasStrf: Boolean, w: Int, h: Int, bits: Int,
                       comp: Int, movi: Long, moviEnd: Long)

  /** None = not a RIFF/'AVI ' stream at all. */
  def header(bytes: Array[Byte]): Option[Hdr] = {
    val len = bytes.length
    def u8(i: Int): Int = bytes(i) & 0xff
    def le32(i: Int): Long =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def fourcc(i: Int, s: String): Boolean =
      (0 until 4).forall(k => u8(i + k) == s.charAt(k))
    if (len < 12 || !fourcc(0, "RIFF") || !fourcc(8, "AVI ")) return None
    var pos = 12L
    var hdrl = -1L; var hdrlEnd = -1L
    var movi = -1L; var moviEnd = -1L
    while (movi < 0 && pos + 8 <= len) {
      val csize = le32(pos.toInt + 4)
      val isList = fourcc(pos.toInt, "LIST") && pos + 12 <= len
      if (isList && fourcc(pos.toInt + 8, "hdrl") && hdrl < 0) {
        hdrl = pos + 12; hdrlEnd = math.min(len.toLong, pos + 8 + csize)
      }
      if (isList && fourcc(pos.toInt + 8, "movi")) {
        movi = pos + 12; moviEnd = math.min(len.toLong, pos + 8 + csize)
      }
      pos += 8 + csize + (csize & 1)
    }
    var found = false
    var w = -1; var h = -1; var bits = -1; var comp = -1
    if (hdrl >= 0) {
      // inside hdrl: find LIST/strl with strh fccType 'vids', read strf
      var p = hdrl
      while (!found && p + 8 <= hdrlEnd) {
        val csize = le32(p.toInt + 4)
        if (fourcc(p.toInt, "LIST") && p + 12 <= hdrlEnd &&
          fourcc(p.toInt + 8, "strl")) {
          // children: strh then strf (spec-mandated order)
          var q = p + 12
          var isVids = false
          val strlEnd = math.min(hdrlEnd, p + 8 + csize)
          while (!found && q + 8 <= strlEnd) {
            val qsize = le32(q.toInt + 4)
            if (fourcc(q.toInt, "strh") && q + 12 <= strlEnd)
              isVids = fourcc(q.toInt + 8, "vids")
            if (fourcc(q.toInt, "strf") && isVids && qsize >= 40 &&
              q + 8 + 40 <= strlEnd) {
              found = true
              val base = (q + 8).toInt
              w = le32(base + 4).toInt
              h = le32(base + 8).toInt
              bits = le16(base + 14)
              comp = le32(base + 16).toInt
            }
            q += 8 + qsize + (qsize & 1)
          }
        }
        p += 8 + csize + (csize & 1)
      }
    }
    Some(Hdr(found, w, h, bits, comp, movi, moviEnd))
  }
}

object AviDibProbe {

  /** Per-frame pixel ceiling — same scale class as
    * `Multimodal.BmpMaxPixels`; beyond it this per-row expression is
    * the wrong tool and the row censuses `bad_dims`. */
  val MaxPixels: Long = 1L << 20

  val schema: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("reason", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bit_count", IntegerType),
    StructField("compression", IntegerType),
    StructField("n_frames", LongType),
    StructField("n_px", LongType),
    StructField("sum_b", LongType),
    StructField("sum_g", LongType),
    StructField("sum_r", LongType),
    StructField("sq_b", LongType),
    StructField("sq_g", LongType),
    StructField("sq_r", LongType)))

  // noinspection ScalaStyle
  def probeToRow(bytes: Array[Byte]): GenericInternalRow = {
    def row(valid: Boolean, reason: String, w: Int = -1, h: Int = -1,
            bits: Int = -1, comp: Int = -1, frames: Long = -1L,
            sums: Array[Long] = null): GenericInternalRow = {
      val r = new GenericInternalRow(14)
      r.update(0, valid)
      r.update(1, if (reason == null) null else UTF8String.fromString(reason))
      if (w >= 0) { r.update(2, w); r.update(3, h) }
      if (bits >= 0) r.update(4, bits)
      if (comp >= 0) r.update(5, comp)
      if (frames >= 0) r.update(6, frames)
      if (sums != null) {
        r.update(7, w.toLong * h * frames)
        var i = 0
        while (i < 6) { r.update(8 + i, sums(i)); i += 1 }
      }
      r
    }
    def fail(reason: String, w: Int = -1, h: Int = -1, bits: Int = -1,
             comp: Int = -1, frames: Long = -1L): GenericInternalRow =
      row(valid = false, reason, w, h, bits, comp, frames)
    try {
      def u8(i: Int): Int = bytes(i) & 0xff
      def le32(i: Int): Long =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)
      val hdr = AviWalk.header(bytes) match {
        case None => return fail("not_avi")
        case Some(x) => x
      }
      val w = hdr.w; val h = hdr.h; val bits = hdr.bits; val comp = hdr.comp
      val movi = hdr.movi; val moviEnd = hdr.moviEnd
      // presence gate, NOT a w-sentinel: an oversized biWidth (≥ 2³¹)
      // reads negative through the signed-truncated le32 and must fall
      // through to the bad_dims gate below, not census no_strf
      if (!hdr.hasStrf) return fail("no_strf")
      if (comp != 0) return fail("compressed", w, h, bits, comp)
      if (bits != 24) return fail("unsupported_depth", w, h, bits, comp)
      if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels)
        return fail("bad_dims", w, h, bits, comp)
      if (movi < 0) return fail("no_movi", w, h, bits, comp)

      val rowBytes = 3L * w
      val stride = (rowBytes + 3) / 4 * 4
      val frameBytes = stride * h
      val sums = new Array[Long](6)
      var frames = 0L
      var m = movi
      while (m + 8 <= moviEnd) {
        val csize = le32(m.toInt + 4)
        val isDib = u8(m.toInt) >= '0' && u8(m.toInt) <= '9' &&
          u8(m.toInt + 1) >= '0' && u8(m.toInt + 1) <= '9' &&
          u8(m.toInt + 2) == 'd' && u8(m.toInt + 3) == 'b'
        if (isDib) {
          if (csize != frameBytes)
            return fail("bad_frame_size", w, h, bits, comp, frames)
          if (m + 8 + csize > moviEnd)
            return fail("trunc_frame", w, h, bits, comp, frames)
          val base = m + 8
          var r = 0
          while (r < h) {
            val rowOff = (base + r * stride).toInt
            var k = 0
            while (k < rowBytes) {
              val v = u8(rowOff + k).toLong
              val c = k % 3 // interleaved B, G, R — the BMP byte order
              sums(c) += v
              sums(3 + c) += v * v
              k += 1
            }
            r += 1
          }
          frames += 1
        }
        m += 8 + csize + (csize & 1)
      }
      // a chunk header cut by the buffer end is a truncation too
      if (m < moviEnd && moviEnd - m < 8)
        return fail("trunc_frame", w, h, bits, comp, frames)
      if (frames == 0) return fail("no_frames", w, h, bits, comp, 0L)
      row(valid = true, null, w, h, bits, comp, frames, sums)
    } catch {
      // belt-and-braces totality (the PngDecode/MpegProbe discipline):
      // any slip in the bounds reasoning must census, not fail the task
      case _: Exception => fail("corrupt")
    }
  }
}

case class AviDibProbeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AviDibProbe.schema
  override def prettyName: String = "avi_dib_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    AviDibProbe.probeToRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.expressions.AviDibProbe.probeToRow($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MJPEG frame EXTRACTION from an AVI container — the container half
  * of Motion-JPEG support, all public spec: when the 'vids' stream's
  * BITMAPINFOHEADER declares biCompression 'MJPG', every `'##dc'`
  * movi chunk is one complete baseline-JPEG image. This probe runs the
  * walk (the exactly-oracle-checkable part: chunk geometry, counts,
  * sizes, magics) and surfaces the frame payloads as a binary array so
  * the already-shipped JDK JPEG path
  * ([[graft.expressions.ImageIoDecode]]) decodes the pixels —
  * spec-pinned like baseline JPEG, since JPEG IDCT rounding is
  * implementation-defined and not ANSI-replayable.
  *
  * Census semantics (q237): `not_avi` / `no_strf` as in
  * [[AviDibProbe]]; `not_mjpeg` when biCompression is anything else
  * (the DIB twin claims 0; genuinely-compressed non-MJPG codecs are
  * the stub boundary); a chunk header or payload crossing the buffer
  * end censuses `trunc_frame` with the complete walked prefix
  * SURFACED (frames stay usable — the census-total-over-dirty-bytes
  * discipline); `no_frames` when the walk finds no '##dc' at all.
  * Frame payloads are NOT validated as JPEG here — the per-frame
  * FFD8 magic is a cheap column expression over the array, and real
  * decode acceptance belongs to the decode layer.
  *
  * Cost is O(buffer): payload slices are bounds-checked copies of
  * bytes physically present; MaxFrames bombs out hostile
  * million-chunk streams. */
object AviMjpegProbe {

  /** Frame-count ceiling — ~36 minutes at 30 fps; beyond it the row
    * censuses `too_many_frames` rather than building an absurd array. */
  val MaxFrames: Int = 1 << 16

  /** 'MJPG' read as the little-endian u32 BITMAPINFOHEADER
    * biCompression field. */
  val MjpgFourcc: Int = 'M' | ('J' << 8) | ('P' << 16) | ('G' << 24)

  val schema: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("reason", StringType),
    StructField("n_frames", LongType),
    StructField("frames", ArrayType(BinaryType, containsNull = false))))

  def probeToRow(bytes: Array[Byte]): GenericInternalRow = {
    def row(valid: Boolean, reason: String, frames: Seq[Array[Byte]]): GenericInternalRow = {
      val r = new GenericInternalRow(4)
      r.update(0, valid)
      r.update(1, if (reason == null) null else UTF8String.fromString(reason))
      if (frames != null) {
        r.update(2, frames.length.toLong)
        r.update(3, new GenericArrayData(frames.toArray[Any]))
      }
      r
    }
    def fail(reason: String, frames: Seq[Array[Byte]] = null): GenericInternalRow =
      row(valid = false, reason, frames)
    try {
      def u8(i: Int): Int = bytes(i) & 0xff
      def le32(i: Int): Long =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)
      val hdr = AviWalk.header(bytes) match {
        case None => return fail("not_avi")
        case Some(x) => x
      }
      // presence boolean, not the w-sentinel (see [[AviWalk.Hdr]]):
      // MJPEG extraction never reads dims, but the census label must
      // agree with the DIB twin's on the same malformed header
      if (!hdr.hasStrf) return fail("no_strf")
      if (hdr.comp != MjpgFourcc) return fail("not_mjpeg")
      if (hdr.movi < 0) return fail("no_movi")
      val frames = Seq.newBuilder[Array[Byte]]
      var n = 0
      var m = hdr.movi
      while (m + 8 <= hdr.moviEnd) {
        val csize = le32(m.toInt + 4)
        val isDc = u8(m.toInt) >= '0' && u8(m.toInt) <= '9' &&
          u8(m.toInt + 1) >= '0' && u8(m.toInt + 1) <= '9' &&
          u8(m.toInt + 2) == 'd' && u8(m.toInt + 3) == 'c'
        if (isDc) {
          if (m + 8 + csize > hdr.moviEnd)
            return fail("trunc_frame", frames.result())
          if (n >= MaxFrames) return fail("too_many_frames", frames.result())
          frames += java.util.Arrays.copyOfRange(
            bytes, (m + 8).toInt, (m + 8 + csize).toInt)
          n += 1
        }
        m += 8 + csize + (csize & 1)
      }
      if (m < hdr.moviEnd && hdr.moviEnd - m < 8)
        return fail("trunc_frame", frames.result())
      val out = frames.result()
      if (out.isEmpty) return fail("no_frames", out)
      row(valid = true, null, out)
    } catch {
      case _: Exception => fail("corrupt")
    }
  }
}

case class AviMjpegProbeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AviMjpegProbe.schema
  override def prettyName: String = "avi_mjpeg_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    AviMjpegProbe.probeToRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.expressions.AviMjpegProbe.probeToRow($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AviDibExpressions {
  def avi_dib_probe(media: Column): Column =
    ColumnBridge.column(AviDibProbeExpr(ColumnBridge.expression(media)))

  def avi_mjpeg_probe(media: Column): Column =
    ColumnBridge.column(AviMjpegProbeExpr(ColumnBridge.expression(media)))
}

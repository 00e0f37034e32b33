package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM PNG pixel decode — PNG's pixel path is zlib/Deflate, which
  * ships in the JDK (`java.util.zip.Inflater`), so unlike JPEG/MP3 no
  * codec library is needed: chunk walk → IDAT inflate → per-scanline
  * de-filter (all five ISO 15948 §9 filter types: None/Sub/Up/Average/
  * Paeth). This retires the raster half of the codec stub
  * ([[graft.multimodal.Multimodal.decodeMediaFeatures]]'s fallback)
  * with public knowledge only.
  *
  * TOTAL over dirty bytes (the EdgeSweep contract): every structural
  * defect — bad signature, truncated chunk walk, short/corrupt IDAT,
  * an out-of-range filter byte — lands as `valid = false` with a
  * `reason`, never a throw. The supported subset is 8-bit depth,
  * colour types 0/2/4/6 (gray, RGB, gray+alpha, RGBA); palette (type
  * 3), other depths, and Adam7 interlace are REJECTED AS CENSUS ROWS
  * (`reason` ∈ palette / unsupported_depth / interlaced) rather than
  * decoded — the same claim-or-exclude discipline as
  * `mediaValidityCensus`. Chunk CRCs are verified only in the
  * `checkCrc` strict mode (mismatch → `bad_crc` census rows); by
  * default the inflater's own Adler-32 guards the pixel data.
  *
  * Output struct: (valid, reason, width, height, bit_depth,
  * color_type, channels, n_px, chan_sum, chan_sqsum, pixels) — the
  * per-channel integer sum / sum-of-squares accumulate in the same
  * decode pass (the BMP-stats parity), and `pixels` (the de-filtered
  * raw samples, scanlines concatenated without filter bytes) rides
  * only when `keepPixels` — at corpus scale the stats are what ship;
  * materializing W×H×C bytes per row is an explicit opt-in.
  *
  * Codegen: the decoder is one static JVM call, so the projection
  * stays inside whole-stage codegen (no lambda interpreter, no
  * CodegenFallback).
  */
object PngDecode {
  /** Decoded-pixel budget: total samples (w·h·channels) above this are
    * rejected as `too_large` — a 4 GB-bomb guard (a 67-byte PNG can
    * declare a petabyte raster; the inflate would then allocate it). */
  val MaxSamples: Long = 1L << 24
  /** Chunk-walk cap sized to the sample budget, not an arbitrary small
    * constant: libpng emits IDAT in 8 KB chunks by default, so a
    * legitimate in-budget image can carry ~2^24/8192 ≈ 2048 IDAT
    * chunks (stored-block overhead can push compressed past raw), plus
    * ancillary tEXt/iTXt/etc. which also count. 2^24/4096 + 1024 slack
    * admits every real-encoder framing of an in-budget raster;
    * walks terminate regardless (the offset advances ≥ 12 bytes per
    * chunk) — the cap only bounds CRC work and yields a truthful
    * `too_many_chunks` census reason instead of `trunc_chunk`. */
  val MaxChunks: Int = (MaxSamples / 4096).toInt + 1024

  val schema: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("reason", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bit_depth", IntegerType),
    StructField("color_type", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_px", LongType),
    StructField("chan_sum", ArrayType(LongType, containsNull = false)),
    StructField("chan_sqsum", ArrayType(LongType, containsNull = false)),
    StructField("pixels", BinaryType)))

  private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => -1
  }

  /** The full decode; never throws. Exposed for the codegen call and
    * for driver-side use (the [[graft.multimodal.Multimodal]]
    * feature-extract path). `checkCrc` is the production strict mode:
    * every chunk's stored CRC-32 (over type + data, ISO 15948 §5.3) is
    * verified and a mismatch rejects the payload as `bad_crc` — off by
    * default because legitimate pipelines often re-frame chunks, the
    * inflater's own Adler-32 already guards the pixel data, and the
    * synthetic oracle corpus zeroes its CRCs. */
  def decodeToRow(bytes: Array[Byte], keepPixels: Boolean): InternalRow =
    decodeToRow(bytes, keepPixels, checkCrc = false)

  def decodeToRow(bytes: Array[Byte], keepPixels: Boolean,
                  checkCrc: Boolean): InternalRow = {
    def fail(reason: String, w: Int = -1, h: Int = -1, d: Int = -1,
             ct: Int = -1, ch: Int = -1): InternalRow = {
      val r = new GenericInternalRow(11)
      r.update(0, false)
      r.update(1, UTF8String.fromString(reason))
      if (w >= 0) r.update(2, w) else r.setNullAt(2)
      if (h >= 0) r.update(3, h) else r.setNullAt(3)
      if (d >= 0) r.update(4, d) else r.setNullAt(4)
      if (ct >= 0) r.update(5, ct) else r.setNullAt(5)
      if (ch > 0) r.update(6, ch) else r.setNullAt(6)
      if (w >= 0 && h >= 0) r.update(7, w.toLong * h) else r.setNullAt(7)
      r.setNullAt(8); r.setNullAt(9); r.setNullAt(10)
      r
    }
    try {
      if (bytes == null || bytes.length < 8 + 25) return fail("bad_sig")
      var i = 0
      while (i < 8) { if (bytes(i) != Sig(i)) return fail("bad_sig"); i += 1 }
      def be4(off: Int): Long =
        ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
          ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
      def tag(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      // IHDR must be the first chunk (ISO 15948 §5.6)
      if (be4(8) != 13L || tag(12) != "IHDR") return fail("no_ihdr")
      val w = be4(16); val h = be4(20)
      val depth = bytes(24) & 0xff
      val colorType = bytes(25) & 0xff
      val compression = bytes(26) & 0xff
      val filterMethod = bytes(27) & 0xff
      val interlace = bytes(28) & 0xff
      val ch = channelsOf(colorType)
      val wi = w.toInt; val hi = h.toInt
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue)
        return fail("bad_dims")
      if (colorType == 3) return fail("palette", wi, hi, depth, colorType)
      if (ch < 0) return fail("bad_color_type", wi, hi, depth, colorType)
      if (depth != 8) return fail("unsupported_depth", wi, hi, depth, colorType, ch)
      if (compression != 0 || filterMethod != 0)
        return fail("bad_compression", wi, hi, depth, colorType, ch)
      if (interlace != 0) return fail("interlaced", wi, hi, depth, colorType, ch)
      // overflow-safe budget check: w and h are each ≤ 2^31−1 (checked
      // above) so w·h ≤ 2^62 cannot overflow a Long, but w·h·ch can
      // (ch up to 4 → 2^64 wraps negative and bypasses the guard, and
      // the downstream Int products become attacker-tunable). Divide
      // the budget by ch instead of multiplying the samples — exactly
      // equivalent for every in-budget product since MaxSamples/ch·ch
      // and MaxSamples differ by < ch and the product is a multiple
      // of ch.
      if (w * h > MaxSamples / ch)
        return fail("too_large", wi, hi, depth, colorType, ch)
      def crcOk(typeOff: Int, dataLen: Int): Boolean = {
        val c = new java.util.zip.CRC32()
        c.update(bytes, typeOff, 4 + dataLen)
        c.getValue == be4(typeOff + 4 + dataLen)
      }
      if (checkCrc && !crcOk(12, 13))
        return fail("bad_crc", wi, hi, depth, colorType, ch)
      // chunk walk: concatenate IDAT payloads until IEND
      val idat = new java.io.ByteArrayOutputStream()
      var off = 8 + 25 // past IHDR (len+type+13+crc)
      var chunks = 0
      var ended = false
      while (!ended) {
        if (chunks >= MaxChunks)
          return fail("too_many_chunks", wi, hi, depth, colorType, ch)
        if (off + 8 > bytes.length)
          return fail("trunc_chunk", wi, hi, depth, colorType, ch)
        val len = be4(off)
        if (len < 0 || len > Int.MaxValue - 12 || off + 12 + len > bytes.length)
          return fail("trunc_chunk", wi, hi, depth, colorType, ch)
        if (checkCrc && !crcOk(off + 4, len.toInt))
          return fail("bad_crc", wi, hi, depth, colorType, ch)
        tag(off + 4) match {
          case "IDAT" => idat.write(bytes, off + 8, len.toInt)
          case "IEND" => ended = true
          case _ => () // ancillary chunks skip
        }
        off += 12 + len.toInt
        chunks += 1
      }
      if (!ended) return fail("trunc_chunk", wi, hi, depth, colorType, ch)
      if (idat.size() == 0) return fail("no_idat", wi, hi, depth, colorType, ch)
      // inflate to EXACTLY h·(1 + w·ch) bytes
      val rowBytes = wi * ch
      val expect = hi * (1 + rowBytes)
      val raw = new Array[Byte](expect)
      val inf = new java.util.zip.Inflater()
      val got = try {
        inf.setInput(idat.toByteArray)
        var n = 0
        while (n < expect && !inf.finished() && !inf.needsInput()) {
          val k = inf.inflate(raw, n, expect - n)
          if (k == 0 && !inf.finished()) return fail("trunc_idat", wi, hi,
            depth, colorType, ch)
          n += k
        }
        n
      } catch {
        case _: java.util.zip.DataFormatException =>
          return fail("corrupt_idat", wi, hi, depth, colorType, ch)
      } finally inf.end()
      if (got < expect) return fail("trunc_idat", wi, hi, depth, colorType, ch)
      // de-filter in place into the output buffer (filter bytes dropped)
      val out = new Array[Byte](hi * rowBytes)
      val bpp = ch // 8-bit depth: bytes per pixel = channels
      val sum = new Array[Long](ch)
      val sq = new Array[Long](ch)
      var y = 0
      while (y < hi) {
        val f = raw(y * (1 + rowBytes)) & 0xff
        if (f > 4) return fail("bad_filter", wi, hi, depth, colorType, ch)
        val src = y * (1 + rowBytes) + 1
        val dst = y * rowBytes
        var x = 0
        while (x < rowBytes) {
          val cur = raw(src + x) & 0xff
          val left = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
          val up = if (y > 0) out(dst - rowBytes + x) & 0xff else 0
          val ul = if (y > 0 && x >= bpp) out(dst - rowBytes + x - bpp) & 0xff
            else 0
          val recon = f match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + ((left + up) >> 1)
            case 4 => // Paeth predictor (ISO 15948 §9.4)
              val p = left + up - ul
              val pa = math.abs(p - left)
              val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              val pred = if (pa <= pb && pa <= pc) left
                else if (pb <= pc) up else ul
              cur + pred
          }
          val v = recon & 0xff
          out(dst + x) = v.toByte
          val c = x % ch
          sum(c) += v
          sq(c) += v.toLong * v
          x += 1
        }
        y += 1
      }
      val r = new GenericInternalRow(11)
      r.update(0, true)
      r.setNullAt(1)
      r.update(2, wi); r.update(3, hi); r.update(4, depth)
      r.update(5, colorType); r.update(6, ch)
      r.update(7, w * h)
      r.update(8, new GenericArrayData(sum))
      r.update(9, new GenericArrayData(sq))
      if (keepPixels) r.update(10, out) else r.setNullAt(10)
      r
    } catch {
      // belt-and-braces totality: any slip in the bounds reasoning
      // above must surface as a census row, not a task failure
      case _: Exception => fail("corrupt")
    }
  }
}

case class PngDecodeExpr(child: Expression, keepPixels: Boolean,
                         checkCrc: Boolean = false)
  extends UnaryExpression {

  override def dataType: DataType = PngDecode.schema
  override def prettyName: String = "png_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    PngDecode.decodeToRow(v.asInstanceOf[Array[Byte]], keepPixels, checkCrc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.expressions.PngDecode.decodeToRow(" +
        s"$b, $keepPixels, $checkCrc);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PngExpressions {
  def png_decode(media: Column, keepPixels: Boolean = false,
                 checkCrc: Boolean = false): Column =
    ColumnBridge.column(PngDecodeExpr(
      ColumnBridge.expression(media), keepPixels, checkCrc))
}

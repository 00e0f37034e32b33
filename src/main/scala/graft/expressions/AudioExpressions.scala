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

/** Pure-JVM audio sample decode — the audio sibling of [[PngDecode]]:
  * every format here is decodable from PUBLIC specifications with zero
  * codec libraries, so the labeled feature stub
  * ([[graft.multimodal.Multimodal.stubDecodeFeatures]]) shrinks to
  * genuinely-codec-requiring MP3/AAC only.
  *
  * Containers and codecs:
  *  - RIFF/WAVE: PCM (8-bit unsigned / 16-bit signed LE, format tag 1),
  *    G.711 A-law (tag 6) and µ-law (tag 7) per ITU-T G.711 — the
  *    segment/mantissa expansion is ~5 integer ops per byte (the exact
  *    Sun `ulaw2linear`/`alaw2linear` arithmetic, which is also what
  *    `javax.sound.sampled`'s own codecs produce — pinned equal in
  *    AudioDecodeSpec), and IMA/DVI ADPCM (tag 0x11) per the IMA
  *    Digital Audio Pack spec: 4-bit nibbles, 89-entry step table,
  *    block header carrying (predictor, step index) per channel.
  *  - AU (Sun ".snd", big-endian header): encodings 1 (µ-law),
  *    2 (8-bit signed PCM), 3 (16-bit signed BE PCM).
  *  - AIFF ("FORM"+"AIFF"): COMM + SSND, 8/16-bit signed BE PCM; the
  *    COMM sample rate is an 80-bit IEEE extended float, parsed
  *    exactly for the integer rates real encoders write.
  *
  * Contracts shared with the rest of the media family:
  *  - TOTAL over dirty bytes: structural defects land as census rows
  *    (`valid=false`, `reason` ∈ not_audio / trunc_chunk / no_fmt /
  *    no_data / unsupported_codec / unsupported_bits / bad_fmt /
  *    too_large / trunc_data), never a throw.
  *  - Integer-exact fused stats: per-channel sum, sum-of-squares and
  *    peak(|sample|) accumulate in the decode loop; samples never
  *    leave the expression. G.711 and ADPCM decode to the 16-bit
  *    domain (`bits` reports 16); PCM stays in its native domain.
  *  - One static JVM call → stays inside whole-stage codegen.
  *
  * µ-law/A-law are ORACLE-CHECKED (q226): the decode arithmetic is
  * pure integer ops DuckDB replays from the synthetic byte formula —
  * the q224 discipline. ADPCM/AIFF/AU are spec-pinned (hand-rolled
  * encoders + `javax.sound.sampled`'s own writers as ground truth):
  * ADPCM's table-driven state machine is not reasonably replayable in
  * set-oriented SQL.
  */
object AudioDecode {
  /** Decoded-sample budget (frames × channels): above this the payload
    * is rejected as `too_large` before any allocation — a 40-byte
    * header can declare terabytes of frames. */
  val MaxSamples: Long = 1L << 24
  val MaxChunks = 4096

  val schema: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("reason", StringType),
    StructField("container", StringType),
    StructField("codec", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_frames", LongType),
    StructField("chan_sum", ArrayType(LongType, containsNull = false)),
    StructField("chan_sqsum", ArrayType(LongType, containsNull = false)),
    StructField("chan_peak", ArrayType(LongType, containsNull = false))))

  // ITU-T G.711 expansion, Sun ulaw2linear arithmetic: 16-bit domain.
  def ulawToLinear(b: Int): Int = {
    val u = (~b) & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  // ITU-T G.711 A-law, Sun alaw2linear arithmetic: 16-bit domain.
  def alawToLinear(b: Int): Int = {
    val a = b ^ 0x55
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    seg match {
      case 0 => t += 8
      case 1 => t += 0x108
      case _ => t = (t + 0x108) << (seg - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  // IMA ADPCM tables (IMA Digital Audio Pack, public spec)
  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val ImaIndex: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  def decodeToRow(bytes: Array[Byte]): InternalRow = {
    def fail(reason: String, container: String = null, codec: String = null,
             ch: Int = -1, rate: Int = -1, bits: Int = -1,
             frames: Long = -1L): InternalRow = {
      val r = new GenericInternalRow(11)
      r.update(0, false)
      r.update(1, UTF8String.fromString(reason))
      if (container != null) r.update(2, UTF8String.fromString(container))
      else r.setNullAt(2)
      if (codec != null) r.update(3, UTF8String.fromString(codec))
      else r.setNullAt(3)
      if (ch > 0) r.update(4, ch) else r.setNullAt(4)
      if (rate > 0) r.update(5, rate) else r.setNullAt(5)
      if (bits > 0) r.update(6, bits) else r.setNullAt(6)
      if (frames >= 0) r.update(7, frames) else r.setNullAt(7)
      r.setNullAt(8); r.setNullAt(9); r.setNullAt(10)
      r
    }
    def ok(container: String, codec: String, ch: Int, rate: Int, bits: Int,
           frames: Long, sum: Array[Long], sq: Array[Long],
           pk: Array[Long]): InternalRow = {
      val r = new GenericInternalRow(11)
      r.update(0, true)
      r.setNullAt(1)
      r.update(2, UTF8String.fromString(container))
      r.update(3, UTF8String.fromString(codec))
      r.update(4, ch); r.update(5, rate); r.update(6, bits)
      r.update(7, frames)
      r.update(8, new GenericArrayData(sum))
      r.update(9, new GenericArrayData(sq))
      r.update(10, new GenericArrayData(pk))
      r
    }
    try {
      if (bytes == null || bytes.length < 12) return fail("not_audio")
      def u8(i: Int): Int = bytes(i) & 0xff
      def le(i: Int, n: Int): Long = {
        var v = 0L; var k = n - 1
        while (k >= 0) { v = (v << 8) | u8(i + k); k -= 1 }
        v
      }
      def be(i: Int, n: Int): Long = {
        var v = 0L; var k = 0
        while (k < n) { v = (v << 8) | u8(i + k); k += 1 }
        v
      }
      def tag(i: Int, s: String): Boolean =
        bytes.length >= i + 4 && (0 until 4).forall(k => u8(i + k) == s.charAt(k))

      // shared accumulation over a frame-indexed sample reader
      def accumulate(container: String, codec: String, ch: Int, rate: Int,
                     bits: Int, frames: Long)
                    (sample: (Long, Int) => Int): InternalRow = {
        if (frames * ch > MaxSamples)
          return fail("too_large", container, codec, ch, rate, bits, frames)
        val sum = new Array[Long](ch); val sq = new Array[Long](ch)
        val pk = new Array[Long](ch)
        var f = 0L
        while (f < frames) {
          var c = 0
          while (c < ch) {
            val v = sample(f, c).toLong
            sum(c) += v; sq(c) += v * v
            if (math.abs(v) > pk(c)) pk(c) = math.abs(v)
            c += 1
          }
          f += 1
        }
        ok(container, codec, ch, rate, bits, frames, sum, sq, pk)
      }

      // ---------------------------------------------------- RIFF/WAVE
      if (tag(0, "RIFF") && tag(8, "WAVE")) {
        var off = 12; var fmtOff = -1; var fmtLen = -1
        var dataOff = -1; var dataLen = -1L; var chunks = 0
        while ((fmtOff < 0 || dataOff < 0) && off + 8 <= bytes.length &&
               chunks < MaxChunks) {
          val csize = le(off + 4, 4)
          if (csize < 0 || csize > Int.MaxValue - 16)
            return fail("trunc_chunk", "wav")
          if (tag(off, "fmt ")) { fmtOff = off + 8; fmtLen = csize.toInt }
          else if (tag(off, "data")) { dataOff = off + 8; dataLen = csize }
          off += 8 + csize.toInt + (csize % 2).toInt
          chunks += 1
        }
        if (fmtOff < 0 || fmtOff + 16 > bytes.length)
          return fail("no_fmt", "wav")
        if (dataOff < 0) return fail("no_data", "wav")
        val codecTag = le(fmtOff, 2).toInt
        val ch = le(fmtOff + 2, 2).toInt
        val rate = le(fmtOff + 4, 4).toInt
        val blockAlign = le(fmtOff + 12, 2).toInt
        val bits = le(fmtOff + 14, 2).toInt
        if (ch < 1 || ch > 8 || rate <= 0)
          return fail("bad_fmt", "wav", null, ch, rate, bits)
        if (dataOff + dataLen > bytes.length)
          return fail("trunc_data", "wav", null, ch, rate, bits)
        val d0 = dataOff
        codecTag match {
          case 1 if bits == 8 || bits == 16 =>
            val bps = bits / 8
            val frames = dataLen / (ch.toLong * bps)
            accumulate("wav", "pcm", ch, rate, bits, frames) { (f, c) =>
              val o = d0 + ((f * ch + c) * bps).toInt
              if (bits == 8) u8(o) - 128
              else { val r = le(o, 2).toInt; if (r >= 32768) r - 65536 else r }
            }
          case 1 => fail("unsupported_bits", "wav", "pcm", ch, rate, bits)
          case 6 | 7 =>
            if (bits != 8)
              return fail("unsupported_bits", "wav",
                if (codecTag == 6) "alaw" else "ulaw", ch, rate, bits)
            val frames = dataLen / ch
            val name = if (codecTag == 6) "alaw" else "ulaw"
            accumulate("wav", name, ch, rate, 16, frames) { (f, c) =>
              val b = u8(d0 + (f * ch + c).toInt)
              if (codecTag == 6) alawToLinear(b) else ulawToLinear(b)
            }
          case 0x11 =>
            if (bits != 4)
              return fail("unsupported_bits", "wav", "ima_adpcm", ch, rate, bits)
            if (ch > 2 || blockAlign < 4 * ch + 4 ||
                dataLen % blockAlign != 0 || dataLen == 0)
              return fail("bad_fmt", "wav", "ima_adpcm", ch, rate, bits)
            // samples per block: the fmt extension when present, else
            // the canonical derivation from the block geometry
            val spb =
              if (fmtLen >= 20 && fmtOff + 20 <= bytes.length &&
                  le(fmtOff + 16, 2) >= 2)
                le(fmtOff + 18, 2).toInt
              else (blockAlign - 4 * ch) * 2 / ch + 1
            if (spb < 1 || (spb - 1) % 8 != 0 ||
                4 * ch + ((spb - 1) / 8) * 4 * ch != blockAlign)
              return fail("bad_fmt", "wav", "ima_adpcm", ch, rate, bits)
            val nBlocks = dataLen / blockAlign
            val frames = nBlocks * spb
            if (frames * ch > MaxSamples)
              return fail("too_large", "wav", "ima_adpcm", ch, rate, bits,
                frames)
            // stateful: decode block-sequentially into the stats
            val sum = new Array[Long](ch); val sq = new Array[Long](ch)
            val pk = new Array[Long](ch)
            val pred = new Array[Int](ch); val idx = new Array[Int](ch)
            var blk = 0L
            while (blk < nBlocks) {
              val bo = d0 + (blk * blockAlign).toInt
              var c = 0
              while (c < ch) {
                val p = le(bo + 4 * c, 2).toInt
                pred(c) = if (p >= 32768) p - 65536 else p
                idx(c) = math.min(88, math.max(0, u8(bo + 4 * c + 2)))
                // the header predictor IS the block's first sample
                sum(c) += pred(c); sq(c) += pred(c).toLong * pred(c)
                if (math.abs(pred(c)) > pk(c)) pk(c) = math.abs(pred(c))
                c += 1
              }
              // nibble payload: 4-byte groups per channel, interleaved
              var s = 1
              while (s < spb) {
                val group = (s - 1) / 8 // which 4-byte group index
                var c = 0
                while (c < ch) {
                  val base = bo + 4 * ch + group * 4 * ch + 4 * c
                  val within = (s - 1) % 8
                  val byte = u8(base + within / 2)
                  val nib = if (within % 2 == 0) byte & 0x0f else byte >> 4
                  val step = ImaStep(idx(c))
                  var diff = step >> 3
                  if ((nib & 1) != 0) diff += step >> 2
                  if ((nib & 2) != 0) diff += step >> 1
                  if ((nib & 4) != 0) diff += step
                  val nv = if ((nib & 8) != 0) pred(c) - diff else pred(c) + diff
                  pred(c) = math.max(-32768, math.min(32767, nv))
                  idx(c) = math.min(88, math.max(0, idx(c) + ImaIndex(nib)))
                  sum(c) += pred(c); sq(c) += pred(c).toLong * pred(c)
                  if (math.abs(pred(c)) > pk(c)) pk(c) = math.abs(pred(c))
                  c += 1
                }
                s += 1
              }
              blk += 1
            }
            ok("wav", "ima_adpcm", ch, rate, 16, frames, sum, sq, pk)
          case _ =>
            fail("unsupported_codec", "wav", s"tag_$codecTag", ch, rate, bits)
        }
      }
      // --------------------------------------------------------- AU
      else if (u8(0) == 0x2e && tag(0, ".snd")) {
        if (bytes.length < 24) return fail("trunc_chunk", "au")
        val dOff = be(4, 4); val dSize0 = be(8, 4)
        val enc = be(12, 4).toInt; val rate = be(16, 4).toInt
        val ch = be(20, 4).toInt
        if (ch < 1 || ch > 8 || rate <= 0 || dOff < 24 ||
            dOff > bytes.length)
          return fail("bad_fmt", "au", null, ch, rate)
        // 0xffffffff means "until EOF" (historic AU convention)
        val dSize = if (dSize0 == 0xffffffffL) bytes.length - dOff
          else dSize0
        if (dOff + dSize > bytes.length)
          return fail("trunc_data", "au", null, ch, rate)
        val d0 = dOff.toInt
        enc match {
          case 1 =>
            val frames = dSize / ch
            accumulate("au", "ulaw", ch, rate, 16, frames) { (f, c) =>
              ulawToLinear(u8(d0 + (f * ch + c).toInt))
            }
          case 2 =>
            val frames = dSize / ch
            accumulate("au", "pcm", ch, rate, 8, frames) { (f, c) =>
              val b = u8(d0 + (f * ch + c).toInt)
              if (b >= 128) b - 256 else b
            }
          case 3 =>
            val frames = dSize / (2L * ch)
            accumulate("au", "pcm", ch, rate, 16, frames) { (f, c) =>
              val r = be(d0 + ((f * ch + c) * 2).toInt, 2).toInt
              if (r >= 32768) r - 65536 else r
            }
          case _ => fail("unsupported_codec", "au", s"enc_$enc", ch, rate)
        }
      }
      // -------------------------------------------------------- AIFF
      else if (tag(0, "FORM") && tag(8, "AIFF")) {
        var off = 12; var ch = -1; var frames = -1L; var bits = -1
        var rate = -1; var sndOff = -1; var sndSize = -1L; var chunks = 0
        while (off + 8 <= bytes.length && chunks < MaxChunks) {
          val csize = be(off + 4, 4)
          if (csize < 0 || csize > Int.MaxValue - 16)
            return fail("trunc_chunk", "aiff")
          if (tag(off, "COMM") && csize >= 18 && off + 26 <= bytes.length) {
            ch = be(off + 8, 2).toInt
            frames = be(off + 10, 4)
            bits = be(off + 14, 2).toInt
            // 80-bit IEEE extended: sign(1) exponent(15) mantissa(64);
            // integer sample rates are exact
            val exp = (be(off + 16, 2) & 0x7fff).toInt - 16383
            val mantHi = be(off + 18, 4)
            // rate = mantissa * 2^(exp-63); real rates fit the top 32
            // mantissa bits: rate = mantHi * 2^(exp-31). Shift in LONG
            // and reject anything past Int.MaxValue: mantHi is up to
            // 2^32-1 and exp up to 62, so the Int shift could wrap to
            // a plausible positive garbage rate that passes rate > 0
            // (a hostile COMM would then census as valid).
            val rateL =
              if (exp < 0 || exp > 62) -1L
              else if (exp >= 31) mantHi << (exp - 31)
              else mantHi >> (31 - exp)
            rate = if (rateL > Int.MaxValue) -1 else rateL.toInt
          } else if (tag(off, "SSND")) {
            if (off + 16 > bytes.length) return fail("trunc_chunk", "aiff")
            val dataOffset = be(off + 8, 4)
            sndOff = off + 16 + dataOffset.toInt
            sndSize = csize - 8 - dataOffset
          }
          off += 8 + csize.toInt + (csize % 2).toInt
          chunks += 1
        }
        if (ch < 0) return fail("no_fmt", "aiff")
        if (sndOff < 0) return fail("no_data", "aiff")
        if (ch < 1 || ch > 8 || rate <= 0 || frames < 0)
          return fail("bad_fmt", "aiff", null, ch, rate, bits)
        if (bits != 8 && bits != 16)
          return fail("unsupported_bits", "aiff", "pcm", ch, rate, bits)
        val bps = bits / 8
        if (sndOff + frames * ch * bps > bytes.length ||
            frames * ch * bps > sndSize)
          return fail("trunc_data", "aiff", "pcm", ch, rate, bits)
        accumulate("aiff", "pcm", ch, rate, bits, frames) { (f, c) =>
          val o = sndOff + ((f * ch + c) * bps).toInt
          if (bits == 8) { val b = u8(o); if (b >= 128) b - 256 else b }
          else { val r = be(o, 2).toInt; if (r >= 32768) r - 65536 else r }
        }
      } else fail("not_audio")
    } catch {
      // belt-and-braces totality (the PngDecode discipline): any slip
      // in the bounds reasoning must census, not fail the task
      case _: Exception => fail("corrupt")
    }
  }
}

case class AudioDecodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AudioDecode.schema
  override def prettyName: String = "audio_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    AudioDecode.decodeToRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.expressions.AudioDecode.decodeToRow($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioExpressions {
  def audio_decode(media: Column): Column =
    ColumnBridge.column(AudioDecodeExpr(ColumnBridge.expression(media)))
}

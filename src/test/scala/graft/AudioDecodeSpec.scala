package graft

import java.io.ByteArrayOutputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._

import graft.expressions.AudioDecode

/** Pins for the pure-JVM audio decoder
  * ([[graft.expressions.AudioDecode]]). Ground truth comes from two
  * independent sides: hand-rolled encoders implementing the public
  * specs (G.711 segment encoding, IMA ADPCM state machine, RIFF/AU/
  * AIFF container layout), and — where the JDK ships the codec —
  * `javax.sound.sampled` itself (its µ-law/A-law expansion and its own
  * AIFF/AU writers must agree with this decoder exactly). q226 is the
  * oracle-checked path for the G.711 arithmetic; this spec owns
  * everything SQL can't replay (ADPCM's table state machine, container
  * variants, dirty-byte totality). */
class AudioDecodeSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------
  // reference encoders (test-side ground truth)
  // ---------------------------------------------------------------
  /** Compand a 16-bit signal through the JDK's OWN G.711 encoder —
    * the decode side is pinned ≡ the JDK table-for-table below, so
    * encoding through the JDK keeps the test free of a third
    * hand-rolled G.711 implementation. */
  private def jdkCompand(pcm: Array[Int], alaw: Boolean): Array[Byte] = {
    val enc = if (alaw) AudioFormat.Encoding.ALAW else AudioFormat.Encoding.ULAW
    val src = new AudioFormat(8000f, 16, 1, true, false)
    val dst = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
    val bytes = pcm.flatMap(v => le(v & 0xffff, 2)).toArray
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), src, pcm.length)
    AudioSystem.getAudioInputStream(dst, ais).readAllBytes()
  }

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
  private def be(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray

  /** RIFF/WAVE writer for arbitrary codec tag + payload. */
  private def wav(codecTag: Int, ch: Int, rate: Int, bits: Int,
                  blockAlign: Int, data: Array[Byte],
                  fmtExt: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val fmt = le(codecTag, 2) ++ le(ch, 2) ++ le(rate, 4) ++
      le(rate.toLong * blockAlign, 4) ++ le(blockAlign, 2) ++ le(bits, 2) ++
      (if (fmtExt.nonEmpty) le(fmtExt.length, 2) ++ fmtExt
       else Array.emptyByteArray)
    val body = "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le(fmt.length, 4) ++ fmt ++
      (if (fmt.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray) ++
      "data".getBytes("US-ASCII") ++ le(data.length, 4) ++ data
    "RIFF".getBytes("US-ASCII") ++ le(body.length, 4) ++ body
  }

  private def decodeOne(bytes: Array[Byte]) =
    Seq(Tuple1(bytes)).toDF("media")
      .select(graft.expressions.AudioExpressions.audio_decode(col("media"))
        .as("d"))
      .select("d.*").collect().head

  // deterministic 16-bit test signal
  private def sig16(n: Int, seed: Int): Array[Int] = {
    var h = seed.toLong * 2654435761L + 1
    Array.fill(n) {
      h = h * 6364136223846793005L + 1442695040888963407L
      ((h >>> 33) % 65536L - 32768L).toInt
    }
  }

  private def stats(samples: Seq[Int], ch: Int): (Seq[Long], Seq[Long], Seq[Long]) = {
    val sum = new Array[Long](ch); val sq = new Array[Long](ch)
    val pk = new Array[Long](ch)
    samples.zipWithIndex.foreach { case (v, i) =>
      val c = i % ch
      sum(c) += v; sq(c) += v.toLong * v
      if (math.abs(v.toLong) > pk(c)) pk(c) = math.abs(v.toLong)
    }
    (sum.toSeq, sq.toSeq, pk.toSeq)
  }

  test("G.711 expansion equals javax.sound's own codec, byte for byte") {
    // decode all 256 µ-law and A-law code points through the JDK's
    // converter and through AudioDecode's arithmetic — must be equal
    for (alaw <- Seq(false, true)) {
      val enc = if (alaw) AudioFormat.Encoding.ALAW else AudioFormat.Encoding.ULAW
      val src = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
      val dst = new AudioFormat(8000f, 16, 1, true, false)
      val codes = Array.tabulate[Byte](256)(i => i.toByte)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(codes), src, 256)
      val pcm = AudioSystem.getAudioInputStream(dst, ais)
      val out = pcm.readAllBytes()
      assert(out.length === 512)
      for (i <- 0 until 256) {
        val jdk = ((out(2 * i + 1) << 8) | (out(2 * i) & 0xff)).toShort.toInt
        val mine = if (alaw) AudioDecode.alawToLinear(i)
                   else AudioDecode.ulawToLinear(i)
        assert(mine === jdk,
          s"${if (alaw) "alaw" else "ulaw"} code $i: mine=$mine jdk=$jdk")
      }
    }
  }

  test("wav pcm / ulaw / alaw: exact fused stats, stereo interleave") {
    val n = 200
    val pcm = sig16(n * 2, seed = 7) // stereo
    // PCM16
    val pcmBytes = pcm.flatMap(v => le(v & 0xffff, 2))
    val r = decodeOne(wav(1, 2, 8000, 16, 4, pcmBytes))
    assert(r.getBoolean(0) && r.getString(3) === "pcm" && r.getLong(7) === n)
    val (s, q, p) = stats(pcm.toSeq, 2)
    assert(r.getSeq[Long](8) === s && r.getSeq[Long](9) === q &&
      r.getSeq[Long](10) === p)
    // µ-law and A-law: encode the signal through the JDK's companding
    // codec, expected stats from the REFERENCE decode of the encoded
    // bytes (quantization included). Half-scale input: the JDK encoder
    // WRAPS instead of clipping near full scale (32767 → code 0xFF →
    // 0), so the round-trip bound only holds inside the lawful range —
    // the decode side is what this library ships and it is pinned
    // exactly above.
    val safe = pcm.map(_ / 2)
    for ((alaw, tagId) <- Seq(false -> 7, true -> 6)) {
      val bytesEnc = jdkCompand(safe, alaw)
      assert(bytesEnc.length === n * 2)
      val decoded = bytesEnc.map(b => if (alaw) AudioDecode.alawToLinear(b & 0xff)
                                      else AudioDecode.ulawToLinear(b & 0xff))
      val rr = decodeOne(wav(tagId, 2, 8000, 8, 2, bytesEnc))
      assert(rr.getBoolean(0) && rr.getInt(6) === 16 && rr.getLong(7) === n)
      assert(rr.getString(3) === (if (alaw) "alaw" else "ulaw"))
      val (s2, q2, p2) = stats(decoded.toSeq, 2)
      assert(rr.getSeq[Long](8) === s2 && rr.getSeq[Long](9) === q2 &&
        rr.getSeq[Long](10) === p2)
      // and the G.711 round trip stays within the segment's step size
      decoded.zip(safe).foreach { case (d, o) =>
        assert(math.abs(d - o) <= 1024, s"G.711 error too large: $d vs $o")
      }
    }
  }

  test("ima adpcm: mono and stereo blocks decode per the IMA state machine") {
    // reference ENCODER (public IMA spec) + the spec's own reference
    // decoder mirror; AudioDecode must match the mirror exactly
    val step = Array(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25,
      28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
      130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
      449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
      1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660,
      4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
      11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
      27086, 29794, 32767)
    val idxTab = Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
    def encodeBlock(samples: Array[Int], pred0: Int, idx0: Int)
    : (Array[Byte], Array[Int]) = {
      var pred = pred0; var idx = idx0
      val nibbles = samples.map { s =>
        val st = step(idx)
        var delta = s - pred
        var nib = 0
        if (delta < 0) { nib = 8; delta = -delta }
        if (delta >= st) { nib |= 4; delta -= st }
        if (delta >= (st >> 1)) { nib |= 2; delta -= st >> 1 }
        if (delta >= (st >> 2)) { nib |= 1 }
        // reference decode mirror (same arithmetic as the decoder)
        var diff = st >> 3
        if ((nib & 1) != 0) diff += st >> 2
        if ((nib & 2) != 0) diff += st >> 1
        if ((nib & 4) != 0) diff += st
        pred = math.max(-32768,
          math.min(32767, if ((nib & 8) != 0) pred - diff else pred + diff))
        idx = math.max(0, math.min(88, idx + idxTab(nib)))
        (nib, pred)
      }
      val bytes = nibbles.map(_._1).grouped(2)
        .map { case Array(a, b) => (a | (b << 4)).toByte
               case Array(a) => a.toByte }
        .toArray
      (bytes, nibbles.map(_._2))
    }
    // mono: one block, spb = 9 -> blockAlign = 4 + 4 = 8
    val spb = 9
    val src = sig16(spb, seed = 3).map(_ / 4)
    val pred0 = src.head
    val (nb, decodedTail) = encodeBlock(src.tail, pred0, 33)
    val block = le(pred0 & 0xffff, 2) ++ Array[Byte](33, 0) ++ nb
    val media = wav(0x11, 1, 8000, 4, 8, block, fmtExt = le(spb, 2))
    val r = decodeOne(media)
    assert(r.getBoolean(0) && r.getString(3) === "ima_adpcm")
    assert(r.getLong(7) === spb && r.getInt(6) === 16)
    val expected = pred0 +: decodedTail.toSeq
    val (s, q, p) = stats(expected, 1)
    assert(r.getSeq[Long](8) === s && r.getSeq[Long](9) === q &&
      r.getSeq[Long](10) === p)

    // stereo: 2 blocks, spb = 17 -> blockAlign = 8 + 2*8 = 24
    val spb2 = 17
    val l = sig16(spb2 * 2, seed = 5).map(_ / 3).take(spb2 * 2)
    val left = l.take(spb2); val right = l.drop(spb2)
    def stereoBlock(ls: Array[Int], rs: Array[Int]): (Array[Byte], Seq[Int]) = {
      val (lb, ld) = encodeBlock(ls.tail, ls.head, 20)
      val (rb, rd) = encodeBlock(rs.tail, rs.head, 40)
      val hdr = le(ls.head & 0xffff, 2) ++ Array[Byte](20, 0) ++
        le(rs.head & 0xffff, 2) ++ Array[Byte](40, 0)
      // interleave 4-byte groups: ch0 then ch1
      val groups = lb.grouped(4).zip(rb.grouped(4))
        .flatMap { case (a, b) => a ++ b }.toArray
      val frames = (ls.head +: ld.toSeq).zip(rs.head +: rd.toSeq)
        .flatMap { case (a, b) => Seq(a, b) }
      (hdr ++ groups, frames)
    }
    val (blk, frames) = stereoBlock(left, right)
    assert(blk.length === 24)
    val media2 = wav(0x11, 2, 44100, 4, 24, blk, fmtExt = le(spb2, 2))
    val r2 = decodeOne(media2)
    assert(r2.getBoolean(0) && r2.getLong(7) === spb2 && r2.getInt(4) === 2)
    val (s2, q2, p2) = stats(frames, 2)
    assert(r2.getSeq[Long](8) === s2 && r2.getSeq[Long](9) === q2 &&
      r2.getSeq[Long](10) === p2)
  }

  test("aiff and au: the JDK's own writers round-trip to exact source stats") {
    val n = 300
    val pcm = sig16(n, seed = 11)
    val pcmBytes = pcm.flatMap(v => le(v & 0xffff, 2)).toArray
    val fmt = new AudioFormat(8000f, 16, 1, true, false) // PCM16 LE
    for ((fileType, container) <- Seq(
        AudioFileFormat.Type.AIFF -> "aiff", AudioFileFormat.Type.AU -> "au")) {
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcmBytes), fmt, n)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, fileType, bos)
      val r = decodeOne(bos.toByteArray)
      assert(r.getBoolean(0), s"$container must decode")
      assert(r.getString(2) === container && r.getString(3) === "pcm")
      assert(r.getInt(4) === 1 && r.getInt(5) === 8000 && r.getInt(6) === 16)
      assert(r.getLong(7) === n)
      val (s, q, p) = stats(pcm.toSeq, 1)
      assert(r.getSeq[Long](8) === s && r.getSeq[Long](9) === q &&
        r.getSeq[Long](10) === p)
    }
  }

  test("census totality: dirty bytes, bombs, unsupported codecs") {
    def reasonOf(b: Array[Byte]): (Boolean, String) = {
      val r = decodeOne(b)
      (r.getBoolean(0), if (r.isNullAt(1)) null else r.getString(1))
    }
    assert(reasonOf(Array[Byte](1, 2, 3)) === (false, "not_audio"))
    assert(reasonOf(Array.fill(64)(0x41.toByte)) === (false, "not_audio"))
    // unsupported codec tag surfaces the tag
    val mp3ish = wav(85, 2, 44100, 0, 1, Array[Byte](1, 2, 3, 4))
    val rm = decodeOne(mp3ish)
    assert(!rm.getBoolean(0) && rm.getString(1) === "unsupported_codec" &&
      rm.getString(3) === "tag_85")
    // declared-huge data: a PCM WAV whose data chunk claims more bytes
    // than the payload carries must census as trunc_data (16 MB claim
    // in a 44-byte file; a full-Int-range claim hits the chunk-size
    // sanity gate as trunc_chunk instead — also covered)
    val huge = wav(1, 2, 8000, 16, 4, Array.emptyByteArray)
    val patched = huge.clone()
    System.arraycopy(le(0x00ffffffL, 4), 0, patched, patched.length - 4, 4)
    assert(reasonOf(patched) === (false, "trunc_data"))
    val insane = huge.clone()
    System.arraycopy(le(0xfffffff0L, 4), 0, insane, insane.length - 4, 4)
    assert(reasonOf(insane) === (false, "trunc_chunk"))
    // a genuinely declared-huge AIFF (frame count) refuses via budget
    // or truncation before allocating
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](8)), fmt, 4)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, bos)
    val aiff = bos.toByteArray
    // patch COMM numSampleFrames (offset: FORM(12) + 'COMM'+size(8) +
    // channels(2) = 22) to 2^31-ish
    val bomb = aiff.clone()
    System.arraycopy(be(0x40000000L, 4), 0, bomb, 22, 4)
    val (bv, br) = reasonOf(bomb)
    assert(!bv && Set("too_large", "trunc_data")(br))
    // truncated mid-chunk-walk
    val good = wav(1, 1, 8000, 16, 2, sig16(50, 1).flatMap(v => le(v & 0xffff, 2)))
    assert(reasonOf(good.take(20)) === (false, "no_fmt"))
  }

  test("hostile AIFF 80-bit rate that overflows Int censuses bad_fmt, not garbage") {
    def reasonOf(b: Array[Byte]): (Boolean, String) = {
      val r = decodeOne(b)
      (r.getBoolean(0), if (r.isNullAt(1)) null else r.getString(1))
    }
    // biased exponent 16383+32 with mantissa 0x80000001·2^32: the true
    // rate is mantHi·2^(32−31) = 0x100000002 ≈ 4.3 GHz — an Int
    // truncation of the shift yields 2, a plausible positive rate that
    // would pass the rate > 0 gate and census a hostile COMM as valid
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](8)), fmt, 4)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, bos)
    val hostile = bos.toByteArray.clone()
    // COMM rate field: FORM(12) + 'COMM'+size(8) + ch(2) + frames(4) +
    // bits(2) = offset 28, 10 bytes of 80-bit extended
    val rate80 = be(0x401fL, 2) ++ be(0x80000001L, 4) ++ be(0L, 4)
    System.arraycopy(rate80, 0, hostile, 28, 10)
    assert(reasonOf(hostile) === (false, "bad_fmt"))
  }

  test("decodeMediaFeatures routes G.711/ADPCM/AU/AIFF to real decode") {
    import graft.multimodal.Multimodal
    val n = 64
    val pcm = sig16(n, seed = 23)
    val codes = jdkCompand(pcm, alaw = false)
    val media = wav(7, 1, 8000, 8, 1, codes)
    val feats = Multimodal.decodeMediaFeatures(media, dim = 8)
    assert(feats.toSeq !== Multimodal.stubDecodeFeatures(media, 8).toSeq)
    val decoded = codes.map(b => AudioDecode.ulawToLinear(b & 0xff))
    val mean = decoded.map(_.toLong).sum.toDouble / n
    val rms = math.sqrt(decoded.map(v => v.toDouble * v).sum / n)
    val peak = decoded.map(v => math.abs(v.toLong)).max
    assert(math.abs(feats(0) - mean / 32768.0) < 1e-6)
    assert(math.abs(feats(1) - rms / 32768.0) < 1e-6)
    assert(math.abs(feats(2) - peak / 32768.0) < 1e-6)
  }
}

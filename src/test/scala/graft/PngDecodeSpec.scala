package graft

import java.util.zip.{CRC32, Deflater}

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** EdgeSweep-grade pins for the pure-JVM PNG decoder
  * ([[graft.expressions.PngDecode]]): a hand-rolled encoder crafts
  * PNGs with every ISO 15948 filter type, every supported colour type,
  * and every rejection class (interlace, palette, 16-bit, truncation,
  * corrupt Deflate streams, garbage), and the decoder must round-trip
  * the valid ones exactly and census the rest — no oracle exists (no
  * DuckDB endpoint inflates Deflate), so the crafted corpus IS the
  * ground truth. */
class PngDecodeSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------
  // crafted-PNG encoder (test-side ground truth)
  // ---------------------------------------------------------------
  private def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be4(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    out.write(be4(payload.length))
    val body = tag.getBytes("US-ASCII") ++ payload
    out.write(body)
    val crc = new CRC32(); crc.update(body)
    out.write(be4(crc.getValue))
    out.toByteArray
  }

  private def ihdr(w: Int, h: Int, depth: Int, colorType: Int,
                   interlace: Int = 0): Array[Byte] =
    chunk("IHDR", Array(
      (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
      (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
      depth.toByte, colorType.toByte, 0, 0, interlace.toByte))

  private val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** Forward-filter `pixels` (h rows of w·ch bytes) with the given
    * per-row filter types, deflate, and wrap in a complete PNG. */
  private def encode(w: Int, h: Int, ch: Int, pixels: Array[Byte],
                     filters: Seq[Int], colorType: Int,
                     idatSplit: Int = 1): Array[Byte] = {
    require(pixels.length == w * h * ch && filters.length == h)
    val rb = w * ch
    val raw = new Array[Byte](h * (1 + rb))
    for (y <- 0 until h) {
      val f = filters(y)
      raw(y * (1 + rb)) = f.toByte
      for (x <- 0 until rb) {
        val cur = pixels(y * rb + x) & 0xff
        val left = if (x >= ch) pixels(y * rb + x - ch) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * rb + x) & 0xff else 0
        val ul = if (y > 0 && x >= ch) pixels((y - 1) * rb + x - ch) & 0xff
          else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(y * (1 + rb) + 1 + x) = ((cur - pred) & 0xff).toByte
      }
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](512)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    d.end()
    val z = comp.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(sig); out.write(ihdr(w, h, 8, colorType))
    // optionally split the zlib stream across several IDAT chunks —
    // decoders must concatenate (ISO 15948 §5.6)
    val step = math.max(1, z.length / idatSplit)
    var o = 0
    while (o < z.length) {
      val n = math.min(step, z.length - o)
      out.write(chunk("IDAT", z.slice(o, o + n)))
      o += n
    }
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  private def decodeOne(png: Array[Byte], keepPixels: Boolean = true) =
    Seq(Tuple1(png)).toDF("media")
      .select(Multimodal.pngDecode(col("media"), keepPixels).as("d"))
      .select("d.*").collect().head

  // deterministic pseudo-random pixels
  private def pix(n: Int, seed: Int): Array[Byte] = {
    var h = seed.toLong * 2654435761L + 1
    Array.fill(n) { h = h * 6364136223846793005L + 1442695040888963407L
      (h >>> 33).toByte }
  }

  test("all five filter types round-trip exactly, every colour type") {
    for ((colorType, ch) <- Seq(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)) {
      val (w, h) = (7, 5) // h = 5 -> one scanline per filter type
      val pixels = pix(w * h * ch, seed = 31 * colorType)
      val png = encode(w, h, ch, pixels, Seq(0, 1, 2, 3, 4), colorType)
      val r = decodeOne(png)
      assert(r.getBoolean(0), s"colour type $colorType must decode")
      assert(r.getInt(2) === w && r.getInt(3) === h && r.getInt(6) === ch)
      assert(r.getAs[Array[Byte]]("pixels").toSeq === pixels.toSeq,
        s"pixel round-trip failed for colour type $colorType")
      // the fused stats equal the ground-truth accumulation
      val sums = Array.fill(ch)(0L); val sqs = Array.fill(ch)(0L)
      pixels.zipWithIndex.foreach { case (b, i) =>
        val v = (b & 0xff).toLong; sums(i % ch) += v; sqs(i % ch) += v * v }
      assert(r.getSeq[Long](8) === sums.toSeq)
      assert(r.getSeq[Long](9) === sqs.toSeq)
    }
  }

  test("multi-IDAT streams concatenate; keepPixels=false ships stats only") {
    val pixels = pix(6 * 4 * 3, seed = 7)
    val png = encode(6, 4, 3, pixels, Seq(4, 3, 2, 1), colorType = 2,
      idatSplit = 5)
    val r = decodeOne(png)
    assert(r.getBoolean(0))
    assert(r.getAs[Array[Byte]]("pixels").toSeq === pixels.toSeq)
    val slim = decodeOne(png, keepPixels = false)
    assert(slim.getBoolean(0) && slim.isNullAt(10))
    assert(slim.getSeq[Long](8) === r.getSeq[Long](8))
  }

  test("rejection census: interlace, palette, 16-bit, truncations, corruption") {
    val pixels = pix(4 * 3 * 3, seed = 3)
    val good = encode(4, 3, 3, pixels, Seq(0, 0, 0), colorType = 2)

    def reasonOf(png: Array[Byte]): (Boolean, String) = {
      val r = decodeOne(png)
      (r.getBoolean(0), if (r.isNullAt(1)) null else r.getString(1))
    }

    // interlaced: flip the IHDR interlace byte (and fix nothing else —
    // the decoder rejects before CRC or IDAT matter)
    val inter = good.clone(); inter(28) = 1
    assert(reasonOf(inter) === (false, "interlaced"))
    // header fields still surface on the census row
    val ri = decodeOne(inter)
    assert(ri.getInt(2) === 4 && ri.getInt(3) === 3)

    val pal = good.clone(); pal(25) = 3
    assert(reasonOf(pal) === (false, "palette"))

    val deep = good.clone(); deep(24) = 16
    assert(reasonOf(deep) === (false, "unsupported_depth"))

    assert(reasonOf(good.dropRight(15)) === (false, "trunc_chunk"))
    assert(reasonOf(sig ++ ihdr(4, 3, 8, 2)) === (false, "trunc_chunk"))

    // corrupt the middle of the zlib stream -> DataFormatException path
    val corrupt = good.clone()
    for (i <- (8 + 25 + 12) until (8 + 25 + 18)) corrupt(i) = 0x55
    val (cv, cr) = reasonOf(corrupt)
    assert(!cv && Set("corrupt_idat", "trunc_idat")(cr))

    // a declared-petabyte raster must refuse before allocating
    assert(reasonOf(sig ++ ihdr(1 << 20, 1 << 20, 8, 2) ++
      chunk("IEND", Array.emptyByteArray)) === (false, "too_large"))

    assert(reasonOf(Array[Byte](1, 2, 3)) === (false, "bad_sig"))

    // dims crafted so w·h·ch wraps PAST 2^63 (w=h=2^31−1, ch=4:
    // product ≡ −2^34+4 mod 2^64 — the pre-fix guard saw a negative
    // and let a ~70-byte header demand a multi-GB allocation); the
    // division-form guard must refuse in the header
    assert(reasonOf(sig ++ ihdr(0x7fffffff, 0x7fffffff, 8, 6) ++
      chunk("IEND", Array.emptyByteArray)) === (false, "too_large"))
  }

  test("chunk cap: libpng-style many-IDAT framing decodes; runaway walks census") {
    // ~12 KB of incompressible pixels split across ~1000 IDAT chunks —
    // real encoders frame IDAT in small chunks (libpng: 8 KB), so a cap
    // sized in the hundreds misclassified legitimate files
    val pixels = pix(64 * 64 * 3, seed = 13)
    val manyIdat = encode(64, 64, 3, pixels, Seq.fill(64)(0), colorType = 2,
      idatSplit = 1000)
    val nChunks = {
      // count crafted chunks: sig + walk
      var off = 8; var n = 0
      while (off + 8 <= manyIdat.length) {
        val len = ((manyIdat(off) & 0xffL) << 24) | ((manyIdat(off + 1) & 0xffL) << 16) |
          ((manyIdat(off + 2) & 0xffL) << 8) | (manyIdat(off + 3) & 0xffL)
        off += 12 + len.toInt; n += 1
      }
      n
    }
    assert(nChunks > 256, s"construction sanity: want >256 chunks, got $nChunks")
    val r = decodeOne(manyIdat)
    assert(r.getBoolean(0), "a legitimately-framed in-budget PNG must decode")

    // a walk exceeding the budget-sized cap gets its own truthful reason
    val flood = new java.io.ByteArrayOutputStream()
    flood.write(sig); flood.write(ihdr(4, 3, 8, 2))
    val junk = chunk("teXt", Array[Byte](1))
    for (_ <- 0 to graft.expressions.PngDecode.MaxChunks) flood.write(junk)
    flood.write(chunk("IEND", Array.emptyByteArray))
    val rf = decodeOne(flood.toByteArray)
    assert(!rf.getBoolean(0) && rf.getString(1) === "too_many_chunks")
  }

  test("strict CRC mode: crafted PNGs pass (real CRCs), a flipped CRC rejects") {
    val pixels = pix(4 * 3 * 3, seed = 21)
    val good = encode(4, 3, 3, pixels, Seq(0, 1, 2), colorType = 2)
    def strict(png: Array[Byte]) =
      Seq(Tuple1(png)).toDF("media")
        .select(Multimodal.pngDecode(col("media"), keepPixels = true,
          checkCrc = true).as("d"))
        .select("d.*").collect().head
    // the test encoder writes REAL CRC-32s, so strict mode decodes
    val ok = strict(good)
    assert(ok.getBoolean(0))
    assert(ok.getAs[Array[Byte]]("pixels").toSeq === pixels.toSeq)
    // flip one bit of the IHDR CRC (offset 29..32) -> bad_crc, with
    // the header fields still surfaced on the census row
    val bad = good.clone(); bad(30) = (bad(30) ^ 0x01).toByte
    val r = strict(bad)
    assert(!r.getBoolean(0) && r.getString(1) === "bad_crc")
    assert(r.getInt(2) === 4 && r.getInt(3) === 3)
    // default (lenient) mode still decodes it — CRCs are advisory there
    assert(decodeOne(bad).getBoolean(0))
    // and a corrupted IDAT CRC also lands as bad_crc under strict mode
    val badIdat = good.clone(); badIdat(badIdat.length - 5) =
      (badIdat(badIdat.length - 5) ^ 0x40).toByte // inside IEND's CRC
    val r2 = strict(badIdat)
    assert(!r2.getBoolean(0) && r2.getString(1) === "bad_crc")
  }

  test("decoder is total over garbage and the census accounts for every row") {
    // 64 dirty payloads: random bytes behind a real PNG signature, so
    // every row enters the chunk walk
    val dirty = (0 until 64).map(i => sig ++ pix(40 + i * 3, seed = i))
    val pixels = pix(5 * 2 * 3, seed = 9)
    val good = encode(5, 2, 3, pixels, Seq(1, 4), colorType = 2)
    val inter = good.clone(); inter(28) = 1
    val rows = (dirty :+ good.toSeq.toArray :+ inter)
      .zipWithIndex.map { case (b, i) => (i.toLong, b) }
    val df = rows.toDF("media_id", "media")
    val census = Multimodal.pngDecodeCensus(df, lit("all"), col("media"))
      .collect().head
    val total = census.getLong(1)
    val accounted = (2 to 7).map(census.getLong).sum
    assert(total === 66L)
    assert(accounted === total, "every PNG-magic row must land in exactly one bucket")
    assert(census.getLong(2) === 1L) // the one valid PNG
    assert(census.getLong(3) === 1L) // the interlaced one
  }

  test("decodeMediaFeatures: PNG path is real (mean/std per channel), not the stub") {
    val ch = 3
    val pixels = pix(8 * 8 * ch, seed = 11)
    val png = encode(8, 8, ch, pixels, Seq.fill(8)(4), colorType = 2)
    val feats = Multimodal.decodeMediaFeatures(png, dim = 8)
    val n = 64.0
    for (c <- 0 until ch) {
      val vs = pixels.zipWithIndex.collect {
        case (b, i) if i % ch == c => (b & 0xff).toDouble }
      val mean = vs.sum / n
      val std = math.sqrt(vs.map(v => v * v).sum / n - mean * mean)
      assert(math.abs(feats(2 * c) - mean / 255.0) < 1e-6)
      assert(math.abs(feats(2 * c + 1) - std / 255.0) < 1e-6)
    }
    // an undecodable PNG still falls to the labeled stub, not zeros
    val inter = png.clone(); inter(28) = 1
    val fallback = Multimodal.decodeMediaFeatures(inter, dim = 8)
    assert(fallback.toSeq === Multimodal.stubDecodeFeatures(inter, 8).toSeq)
  }
}

package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Pins for the JDK-registry raster decode
  * ([[graft.expressions.ImageIoDecode]]): ImageIO's own ENCODERS
  * provide the ground truth — whatever the JDK writes, the expression
  * must decode with exactly the stats of the source raster (PNG/GIF
  * are lossless; JPEG is lossy, so its pin is agreement with the
  * JDK's own decode of the same bytes, which is what the expression
  * wraps). Dirty bytes land in census buckets, never throw. */
class ImageIoDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def rgb(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var s = seed.toLong * 2654435761L + 1
    for (y <- 0 until h; x <- 0 until w) {
      s = s * 6364136223846793005L + 1442695040888963407L
      img.setRGB(x, y, ((s >>> 33) & 0xffffff).toInt)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK must ship a $fmt writer")
    bos.toByteArray
  }

  private def decodeOne(bytes: Array[Byte]) =
    Seq(Tuple1(bytes)).toDF("media")
      .select(Multimodal.imageIoDecode(col("media")).as("d"))
      .select("d.*").collect().head

  /** Per-band integer sums straight from a BufferedImage raster. */
  private def rasterStats(img: BufferedImage): (Array[Long], Array[Long]) = {
    val r = img.getRaster
    val bands = r.getNumBands
    val sum = new Array[Long](bands); val sq = new Array[Long](bands)
    for (b <- 0 until bands; y <- 0 until img.getHeight;
         x <- 0 until img.getWidth) {
      val v = r.getSample(x, y, b).toLong
      sum(b) += v; sq(b) += v * v
    }
    (sum, sq)
  }

  test("lossless formats round-trip exact stats (png incl. what PngDecode rejects)") {
    val img = rgb(9, 7, seed = 5)
    val (sum, sq) = rasterStats(img)
    // tiff: JDK 9+ ships a TIFF ImageIO plugin (verified present in
    // this JDK's registry) — the registry decoder claims it for free
    for (fmt <- Seq("png", "gif", "bmp", "tiff")) {
      val bytes = encode(img, fmt)
      val r = decodeOne(bytes)
      assert(r.getBoolean(0), s"$fmt must decode")
      assert(r.getString(2).contains(fmt.take(3)) || fmt == "png")
      assert(r.getInt(3) === 9 && r.getInt(4) === 7)
      if (fmt != "gif") {
        assert(r.getSeq[Long](7) === sum.toSeq, s"$fmt chan_sum")
        assert(r.getSeq[Long](8) === sq.toSeq, s"$fmt chan_sqsum")
      } else {
        // gif palettizes — the decoder must expand THROUGH the palette
        // (stats over color values, never indices). Ground truth: the
        // JDK's own decode, read per-channel via getRGB (which applies
        // the palette). First three bands are R,G,B; an alpha band, if
        // the expanded model carries one, sums to 255·n_px.
        val back = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        val exp = new Array[Long](3)
        for (y <- 0 until 7; x <- 0 until 9) {
          val p = back.getRGB(x, y)
          exp(0) += (p >> 16) & 0xff; exp(1) += (p >> 8) & 0xff
          exp(2) += p & 0xff
        }
        val got = r.getSeq[Long](7)
        assert(got.take(3) === exp.toSeq, "gif chan_sum must be post-palette RGB")
        if (got.length == 4) assert(got(3) === 255L * 63, "gif alpha band")
      }
    }
  }

  test("jpeg: real Huffman+IDCT decode, stats equal the JDK's own decode") {
    val img = rgb(16, 12, seed = 9)
    val jpeg = encode(img, "jpg")
    val r = decodeOne(jpeg)
    assert(r.getBoolean(0) && r.getString(2).startsWith("j"))
    assert(r.getInt(3) === 16 && r.getInt(4) === 12 && r.getInt(5) === 3)
    // ground truth: the JDK's own decode of the same bytes
    val back = ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    val (sum, sq) = rasterStats(back)
    assert(r.getSeq[Long](7) === sum.toSeq)
    assert(r.getSeq[Long](8) === sq.toSeq)
    // and lossy-but-sane: means within 3/255 of the source raster
    val (srcSum, _) = rasterStats(img)
    val n = 16.0 * 12
    for (b <- 0 until 3)
      assert(math.abs(sum(b) / n - srcSum(b) / n) < 3.0,
        s"band $b mean drifted more than JPEG loss should allow")
  }

  test("the decoder covers PngDecode's census-row formats (interlaced png)") {
    // an ImageIO PNG of >=1 pixel run through... ImageIO always writes
    // non-interlaced; craft interlace via the param API if supported,
    // else skip — the lossless round-trip above already covers the
    // registry path. Palette PNG: ImageIO writes TYPE_BYTE_INDEXED as
    // palette, which PngDecode censuses away but this decoder claims.
    val pal = new BufferedImage(6, 4, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 4; x <- 0 until 6) pal.setRGB(x, y, (x * 40) << 16)
    val bytes = encode(pal, "png")
    // native path rejects it as a census row...
    val native = Seq(Tuple1(bytes)).toDF("media")
      .select(Multimodal.pngDecode(col("media")).as("d"))
      .select("d.*").collect().head
    assert(!native.getBoolean(0) && native.getString(1) === "palette")
    // ...the registry path decodes it — and expands through the
    // palette: chan_sum must be the COLOR values the palette maps to
    // (setRGB on TYPE_BYTE_INDEXED snaps to the default-palette
    // nearest color, so ground truth is again the JDK's own
    // palette-applied getRGB), not the raw indices the raster stores.
    val r = decodeOne(bytes)
    assert(r.getBoolean(0) && r.getLong(6) === 24L)
    val back = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val exp = new Array[Long](3)
    for (y <- 0 until 4; x <- 0 until 6) {
      val p = back.getRGB(x, y)
      exp(0) += (p >> 16) & 0xff; exp(1) += (p >> 8) & 0xff; exp(2) += p & 0xff
    }
    assert(r.getSeq[Long](7).take(3) === exp.toSeq,
      "palette png chan_sum must be post-palette RGB, not indices")
    assert(exp(0) > 0L, "construction sanity: red channel is non-trivial")
  }

  test("imageAHash survives a palettized re-encode (the dedup-keying property)") {
    val img = rgb(8, 8, seed = 17)
    def hashOf(bytes: Array[Byte]): Long = {
      val r = Seq(Tuple1(bytes)).toDF("media")
        .select(Multimodal.imageAHash(col("media")).as("d"))
        .select("d.*").collect().head
      assert(r.getBoolean(0)); r.getLong(2)
    }
    val h1 = hashOf(encode(img, "png"))
    val h2 = hashOf(encode(img, "gif")) // 63 distinct colors → palettized
    val dist = java.lang.Long.bitCount(h1 ^ h2)
    assert(dist <= 8, s"palettized GIF re-encode drifted $dist of 64 bits " +
      "(pre-fix this was arbitrary: the hash pooled palette indices)")
  }

  test("total over garbage; bomb guard refuses declared-huge rasters") {
    for (bytes <- Seq(Array[Byte](), Array[Byte](1, 2, 3),
      Array.fill(64)(0x55.toByte))) {
      val r = decodeOne(bytes)
      assert(!r.getBoolean(0) && r.getString(1) === "no_reader")
    }
    // a real PNG header declaring 2^20 x 2^20 (the q224 builder's
    // too_large construction) must refuse before allocating
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def be4(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val crc = new java.util.zip.CRC32()
    val body = "IHDR".getBytes("US-ASCII") ++ be4(1L << 20) ++ be4(1L << 20) ++
      Array[Byte](8, 2, 0, 0, 0)
    crc.update(body)
    val huge = sig ++ be4(13) ++ body ++ be4(crc.getValue)
    val r = decodeOne(huge)
    assert(!r.getBoolean(0) && r.getString(1) === "too_large")
    assert(r.getInt(3) === (1 << 20))
  }

  test("imageAHash: exact under grid-aligned NN upscale, stable under JPEG loss") {
    val img = rgb(8, 8, seed = 17)
    def hashOf(bytes: Array[Byte]): (Boolean, Option[Long]) = {
      val r = Seq(Tuple1(bytes)).toDF("media")
        .select(Multimodal.imageAHash(col("media")).as("d"))
        .select("d.*").collect().head
      (r.getBoolean(0), if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }
    val (v1, h1) = hashOf(encode(img, "png"))
    assert(v1 && h1.nonEmpty)
    // 4x nearest-neighbour upscale: cell sums scale uniformly, bits
    // identical (grid-aligned: 8 | 32)
    val up = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32)
      up.setRGB(x, y, img.getRGB(x / 4, y / 4))
    val (v2, h2) = hashOf(encode(up, "png"))
    assert(v2 && h2 === h1, "NN upscale must hash identically")
    // JPEG re-encode of the upscale: lossy but perceptually equal —
    // a few bits at most
    val (v3, h3) = hashOf(encode(up, "jpg"))
    assert(v3 && h3.nonEmpty)
    val dist = java.lang.Long.bitCount(h1.get ^ h3.get)
    assert(dist <= 8, s"JPEG re-encode drifted $dist of 64 bits")
    // grayscale path and garbage totality
    val gray = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8; x <- 0 until 8)
      gray.getRaster.setSample(x, y, 0, (x * y * 4) % 256)
    val (v4, h4) = hashOf(encode(gray, "png"))
    assert(v4 && h4.nonEmpty)
    val (v5, h5) = hashOf(Array[Byte](9, 9, 9))
    assert(!v5 && h5.isEmpty)
  }

  test("decodeMediaFeatures: JPEG path is real, not the stub") {
    val img = rgb(8, 8, seed = 3)
    val jpeg = encode(img, "jpg")
    val feats = Multimodal.decodeMediaFeatures(jpeg, dim = 8)
    assert(feats.toSeq !== Multimodal.stubDecodeFeatures(jpeg, 8).toSeq)
    // features = per-band mean/std of the JDK decode
    val back = ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    val (sum, sq) = rasterStats(back)
    val n = 64.0
    for (b <- 0 until 3) {
      val mean = sum(b) / n
      val std = math.sqrt(sq(b) / n - mean * mean)
      assert(math.abs(feats(2 * b) - mean / 255.0) < 1e-6)
      assert(math.abs(feats(2 * b + 1) - std / 255.0) < 1e-6)
    }
  }
}

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

/** Raster decode through the JDK's own codec registry
  * (`javax.imageio` — java.desktop ships in every standard JDK, no
  * external library): the production catch-all next to the
  * hand-rolled scan-fused decoders. [[PngDecode]] stays the
  * no-dependency exact path for 8-bit PNG; THIS expression covers what
  * it censuses away — baseline JPEG (the JDK reader does the full
  * Huffman + IDCT), interlaced and palette PNG, GIF, BMP variants —
  * anything an installed ImageReader claims.
  *
  * Same contracts as the rest of the media family:
  *  - TOTAL over dirty bytes: unclaimable payloads land as
  *    `no_reader`, oversized declared rasters as `too_large` (the
  *    header is read BEFORE pixels are allocated — bomb guard),
  *    mid-decode failures as `decode_error`; never a throw.
  *  - census-friendly struct out: (valid, reason, format, width,
  *    height, channels, n_px, chan_sum, chan_sqsum) — exact integer
  *    per-band sums, no raster ever leaves the expression (at corpus
  *    scale the stats ship, not pixels).
  *  - one static JVM call, so the projection stays inside whole-stage
  *    codegen.
  *
  * Determinism note: JPEG inverse-DCT rounding is implementation-
  * defined (ITU T.81 conformance allows small deviations), so JPEG
  * stats are deterministic per JDK but not ANSI-replayable — this
  * expression is spec-pinned (ImageIoDecodeSpec round-trips ImageIO's
  * own encoder), deliberately outside the oracle inventory; the
  * oracle-checked decode path is q224's stored-Deflate PNG corpus.
  */
object ImageIoDecode {
  /** Pixel budget (w·h): above this the reader is never asked for
    * pixels — a 100-byte header can declare a petabyte raster. */
  val MaxPixels: Long = 1L << 24

  // executor-safe ImageIO configuration: no AWT display, no on-disk
  // stream cache (payloads are in-memory byte arrays)
  locally {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  val schema: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("reason", StringType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_px", LongType),
    StructField("chan_sum", ArrayType(LongType, containsNull = false)),
    StructField("chan_sqsum", ArrayType(LongType, containsNull = false))))

  /** Header-guarded single decode shared by the stats and hash
    * expressions: Left(reason[, fmt, w, h]) or Right(fmt, image). The
    * raster is never allocated before the declared dimensions pass the
    * pixel budget. */
  private[expressions] def readGuarded(bytes: Array[Byte])
  : Either[(String, String, Int, Int), (String, java.awt.image.BufferedImage)] = {
    if (bytes == null || bytes.length == 0) return Left(("no_reader", null, -1, -1))
    var iis: javax.imageio.stream.ImageInputStream = null
    var reader: javax.imageio.ImageReader = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Left(("no_reader", null, -1, -1))
      reader = readers.next()
      reader.setInput(iis, true, true)
      val fmt = reader.getFormatName.toLowerCase
      val (w, h) =
        try (reader.getWidth(0), reader.getHeight(0))
        catch { case _: Exception => return Left(("decode_error", fmt, -1, -1)) }
      if (w <= 0 || h <= 0) return Left(("decode_error", fmt, w, h))
      if (w.toLong * h > MaxPixels) return Left(("too_large", fmt, w, h))
      val img =
        try reader.read(0)
        catch { case _: Exception => return Left(("decode_error", fmt, w, h)) }
      if (img == null) Left(("decode_error", fmt, w, h))
      else Right((fmt, expandIndexed(img)))
    } catch {
      case _: Exception => Left(("decode_error", null, -1, -1))
    } finally {
      if (reader != null) reader.dispose()
      if (iis != null) try iis.close() catch { case _: Exception => () }
    }
  }

  /** Indexed-color rasters (palette PNG, GIF) store palette INDICES in
    * their bands — summing or luminance-weighting those produces
    * numbers with no perceptual meaning (index 3 may be white, index 4
    * black), so downstream stats would not survive a palettized
    * re-encode of the same pixels. Expand through the palette to a
    * direct-color raster first: band order comes out R,G,B(,A) —
    * exactly what the stats and [[ImageAHash]]'s 2R+5G+B luma assume.
    * Drawing into a BufferedImage is pure raster work (headless-safe,
    * no display); bounded by the MaxPixels budget already enforced. */
  private[expressions] def expandIndexed(
      img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
    if (!img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]) img
    else {
      val t = if (img.getColorModel.hasAlpha)
        java.awt.image.BufferedImage.TYPE_INT_ARGB
      else java.awt.image.BufferedImage.TYPE_INT_RGB
      val out = new java.awt.image.BufferedImage(img.getWidth, img.getHeight, t)
      val g = out.createGraphics()
      try g.drawImage(img, 0, 0, null) finally g.dispose()
      out
    }
  }

  def decodeToRow(bytes: Array[Byte]): InternalRow = {
    def fail(reason: String, fmt: String = null, w: Int = -1,
             h: Int = -1): InternalRow = {
      val r = new GenericInternalRow(9)
      r.update(0, false)
      r.update(1, UTF8String.fromString(reason))
      if (fmt != null) r.update(2, UTF8String.fromString(fmt)) else r.setNullAt(2)
      if (w >= 0) r.update(3, w) else r.setNullAt(3)
      if (h >= 0) r.update(4, h) else r.setNullAt(4)
      r.setNullAt(5)
      if (w >= 0 && h >= 0) r.update(6, w.toLong * h) else r.setNullAt(6)
      r.setNullAt(7); r.setNullAt(8)
      r
    }
    try {
      val (fmt, img) = readGuarded(bytes) match {
        case Left((reason, f, w, h)) => return fail(reason, f, w, h)
        case Right(ok) => ok
      }
      val w = img.getWidth; val h = img.getHeight
      val raster = img.getRaster
      val bands = raster.getNumBands
      val sum = new Array[Long](bands)
      val sq = new Array[Long](bands)
      val row = new Array[Int](w)
      var b = 0
      while (b < bands) {
        var y = 0
        while (y < h) {
          raster.getSamples(0, y, w, 1, b, row)
          var x = 0
          while (x < w) {
            val v = row(x).toLong
            sum(b) += v; sq(b) += v * v
            x += 1
          }
          y += 1
        }
        b += 1
      }
      val r = new GenericInternalRow(9)
      r.update(0, true)
      r.setNullAt(1)
      r.update(2, UTF8String.fromString(fmt))
      r.update(3, w); r.update(4, h); r.update(5, bands)
      r.update(6, w.toLong * h)
      r.update(7, new GenericArrayData(sum))
      r.update(8, new GenericArrayData(sq))
      r
    } catch {
      case _: Exception => fail("decode_error")
    }
  }
}

/** 64-bit perceptual average-hash over ANY JDK-decodable raster — the
  * real implementation of the contract [[graft.multimodal.Multimodal]]
  * `bmpAHash` documents and guards ("larger images pool to an 8×8
  * grid first, same math per cell"): decode via [[ImageIoDecode]]'s
  * registry path, average-pool luminance to 8×8 in EXACT integers,
  * and set bit (8·i + j) iff the cell's mean luminance exceeds the
  * image mean — compared cross-multiplied
  * (cell_sum · n_total > total_sum · n_cell), no division, the q195/
  * q210 exactness discipline. Luma = 2R + 5G + B (the repo's integer
  * weights) for ≥3-band rasters, 8·v for gray so scales agree.
  * Nearest-neighbour upscales by grid-aligned factors hash
  * identically; JPEG re-encodes land within a few bits — the
  * perceptual property the dedup family keys on. Returns
  * (valid, reason, ahash); undecodable payloads census out like the
  * decoder itself. */
object ImageAHash {
  val schema: StructType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("reason", StringType),
    StructField("ahash", LongType)))

  def hashToRow(bytes: Array[Byte]): InternalRow = {
    def fail(reason: String): InternalRow = {
      val r = new GenericInternalRow(3)
      r.update(0, false)
      r.update(1, UTF8String.fromString(reason))
      r.setNullAt(2)
      r
    }
    try {
      val img = ImageIoDecode.readGuarded(bytes) match {
        case Left((reason, _, _, _)) => return fail(reason)
        case Right((_, i)) => i
      }
      val raster = img.getRaster
      val w = img.getWidth; val h = img.getHeight
      val bands = raster.getNumBands
      val cellSum = new Array[Long](64)
      val cellN = new Array[Long](64)
      val rowBuf = Array.ofDim[Int](bands, w)
      var total = 0L
      var y = 0
      while (y < h) {
        var b = 0
        while (b < bands) {
          raster.getSamples(0, y, w, 1, b, rowBuf(b)); b += 1
        }
        val ci = y * 8 / h
        var x = 0
        while (x < w) {
          val lum =
            if (bands >= 3)
              2L * rowBuf(0)(x) + 5L * rowBuf(1)(x) + rowBuf(2)(x)
            else 8L * rowBuf(0)(x)
          val cell = ci * 8 + x * 8 / w
          cellSum(cell) += lum
          cellN(cell) += 1
          total += lum
          x += 1
        }
        y += 1
      }
      val nTotal = w.toLong * h
      var hash = 0L
      var c = 0
      while (c < 64) {
        // cell mean > image mean, cross-multiplied exact (empty cells
        // from sub-8px dimensions contribute 0)
        if (cellN(c) > 0 && cellSum(c) * nTotal > total * cellN(c))
          hash |= 1L << c
        c += 1
      }
      val r = new GenericInternalRow(3)
      r.update(0, true)
      r.setNullAt(1)
      r.update(2, hash)
      r
    } catch { case _: Exception => fail("decode_error") }
  }
}

case class ImageAHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ImageAHash.schema
  override def prettyName: String = "image_ahash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    ImageAHash.hashToRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.expressions.ImageAHash.hashToRow($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ImageIoDecodeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageIoDecode.schema
  override def prettyName: String = "imageio_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    ImageIoDecode.decodeToRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.expressions.ImageIoDecode.decodeToRow($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageIoExpressions {
  def imageio_decode(media: Column): Column =
    ColumnBridge.column(ImageIoDecodeExpr(ColumnBridge.expression(media)))

  def image_ahash(media: Column): Column =
    ColumnBridge.column(ImageAHashExpr(ColumnBridge.expression(media)))
}

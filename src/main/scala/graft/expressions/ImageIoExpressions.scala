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
    if (bytes == null || bytes.length == 0) return fail("no_reader")
    var iis: javax.imageio.stream.ImageInputStream = null
    var reader: javax.imageio.ImageReader = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return fail("no_reader")
      reader = readers.next()
      reader.setInput(iis, true, true)
      val fmt = reader.getFormatName.toLowerCase
      val (w, h) =
        try (reader.getWidth(0), reader.getHeight(0))
        catch { case _: Exception => return fail("decode_error", fmt) }
      if (w <= 0 || h <= 0) return fail("decode_error", fmt, w, h)
      if (w.toLong * h > MaxPixels) return fail("too_large", fmt, w, h)
      val img =
        try reader.read(0)
        catch { case _: Exception => return fail("decode_error", fmt, w, h) }
      if (img == null) return fail("decode_error", fmt, w, h)
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
    } finally {
      if (reader != null) reader.dispose()
      if (iis != null) try iis.close() catch { case _: Exception => () }
    }
  }
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
}

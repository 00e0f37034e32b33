package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.expressions.{AviMjpegProbe, ImageIoDecode}
import graft.multimodal.Multimodal

/** Motion-JPEG pins: the extraction walk (unit-level, crafted
  * containers) and the decode composition — REAL JDK-encoded JPEG
  * frames inside a real AVI container must decode through
  * `mjpegFrameStats` to exactly the sums the JDK's own per-image
  * decode of the identical bytes produces. The geometry census is
  * oracle-checked separately (q237); these pins own the pixel half,
  * which JPEG IDCT rounding keeps out of ANSI-oracle reach. */
class MjpegSpec extends SparkSpec {

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def mjpegAvi(frames: Seq[Array[Byte]],
                       comp: Array[Byte] = fcc("MJPG")): Array[Byte] = {
    val strf = fcc("strf") ++ le(40, 4) ++
      le(40, 4) ++ le(16, 4) ++ le(16, 4) ++ le(1, 2) ++ le(24, 2) ++
      comp ++ le(0, 4) ++ le(0, 4) ++ le(0, 4) ++ le(0, 4) ++ le(0, 4)
    val strh = fcc("strh") ++ le(56, 4) ++ fcc("vids") ++ fcc("MJPG") ++
      Array.fill[Byte](48)(0)
    val strl = fcc("LIST") ++ le(4 + strh.length + strf.length, 4) ++
      fcc("strl") ++ strh ++ strf
    val avih = fcc("avih") ++ le(56, 4) ++ Array.fill[Byte](56)(0)
    val hdrl = fcc("LIST") ++ le(4 + avih.length + strl.length, 4) ++
      fcc("hdrl") ++ avih ++ strl
    val movi = frames.zipWithIndex.flatMap { case (f, i) =>
      val id = f"${i % 100}%02ddc".getBytes("US-ASCII")
      (id ++ le(f.length, 4) ++ f ++
        (if (f.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)).toSeq
    }.toArray
    val moviL = fcc("LIST") ++ le(4 + movi.length, 4) ++ fcc("movi") ++ movi
    val body = fcc("AVI ") ++ hdrl ++ moviL
    fcc("RIFF") ++ le(body.length, 4) ++ body
  }

  private def jpeg(seed: Int, w: Int = 16, h: Int = 12): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (seed * 2654435761L + y * 31 + x * 7).toInt & 0xffffff)
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    out.toByteArray
  }

  test("extraction walk: counts, payload identity, gates") {
    val f0 = jpeg(1); val f1 = jpeg(2)
    val r = AviMjpegProbe.probeToRow(mjpegAvi(Seq(f0, f1)))
    assert(r.getBoolean(0))
    assert(r.getLong(2) === 2L)
    val arr = r.getArray(3)
    assert(arr.getBinary(0).toSeq === f0.toSeq) // byte-exact extraction
    assert(arr.getBinary(1).toSeq === f1.toSeq)
    def reason(b: Array[Byte]) = {
      val x = AviMjpegProbe.probeToRow(b)
      if (x.isNullAt(1)) null else x.getUTF8String(1).toString
    }
    assert(reason(mjpegAvi(Seq(f0), comp = le(0, 4))) === "not_mjpeg")
    assert(reason(mjpegAvi(Seq.empty)) === "no_frames")
    assert(reason("junkjunkjunk".getBytes) === "not_avi")
    // truncated second frame: first frame surfaced, census trunc_frame
    val whole = mjpegAvi(Seq(f0, f1))
    val cut = whole.dropRight(f1.length / 2)
    val t = AviMjpegProbe.probeToRow(cut)
    assert(!t.getBoolean(0))
    assert(t.getUTF8String(1).toString === "trunc_frame")
    assert(t.getLong(2) === 1L)
    assert(t.getArray(3).getBinary(0).toSeq === f0.toSeq)
  }

  test("mjpegFrameStats ≡ the JDK's own decode of the identical frame bytes") {
    import spark.implicits._
    val frames = Seq(jpeg(1), jpeg(2), jpeg(3))
    val media = Seq((1L, mjpegAvi(frames.take(2))), (2L, mjpegAvi(frames)))
      .toDF("doc_id", "media")
    val got = Multimodal.mjpegFrameStats(media, col("doc_id"), col("media"))
      .orderBy("id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    def expect(fs: Seq[Array[Byte]]): (Long, Long, Long, Long) = {
      val rows = fs.map(ImageIoDecode.decodeToRow)
      assert(rows.forall(_.getBoolean(0)))
      (rows.map(_.getLong(6)).sum,
        rows.map(_.getArray(7).getLong(0)).sum,
        rows.map(_.getArray(7).getLong(1)).sum,
        rows.map(_.getArray(7).getLong(2)).sum)
    }
    val e1 = expect(frames.take(2)); val e2 = expect(frames)
    assert(got(0) === ((1L, 2L, 2L, e1._1, e1._2, e1._3, e1._4)))
    assert(got(1) === ((2L, 3L, 3L, e2._1, e2._2, e2._3, e2._4)))
  }

  test("truncated media keep their walked-prefix frames; frameless failures drop") {
    import spark.implicits._
    val f0 = jpeg(7); val f1 = jpeg(8)
    val whole = mjpegAvi(Seq(f0, f1))
    val cut = whole.dropRight(f1.length / 2) // trunc_frame, f0 surfaced
    val media = Seq(
      (1L, cut),                               // invalid BUT 1 usable frame
      (2L, mjpegAvi(Seq(f0), comp = le(0, 4))), // not_mjpeg: no frames
      (3L, "junkjunkjunk".getBytes)             // not_avi: frames null
    ).toDF("doc_id", "media")
    val got = Multimodal.mjpegFrameStats(media, col("doc_id"), col("media"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val g = ImageIoDecode.decodeToRow(f0)
    // AviMjpegProbe surfaces trunc_frame prefixes as usable — the
    // stats reader must honor that, not silently drop the media
    assert(got.toSeq === Seq((1L, 1L, 1L, g.getLong(6),
      g.getArray(7).getLong(0), g.getArray(7).getLong(1),
      g.getArray(7).getLong(2))))
  }

  test("a frame the JDK rejects lowers n_decoded without poisoning the sums") {
    import spark.implicits._
    val good = jpeg(5)
    val bad = Array[Byte](-1, -40, 1, 2, 3) // FFD8 magic, garbage body
    val media = Seq((1L, mjpegAvi(Seq(good, bad)))).toDF("doc_id", "media")
    val got = Multimodal.mjpegFrameStats(media, col("doc_id"), col("media"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val g = ImageIoDecode.decodeToRow(good)
    assert(got === ((1L, 2L, 1L, g.getLong(6), g.getArray(7).getLong(0),
      g.getArray(7).getLong(1), g.getArray(7).getLong(2))))
  }
}

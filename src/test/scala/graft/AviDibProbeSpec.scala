package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.AviDibProbe

/** Unit pins for the AVI uncompressed-DIB frame walk — crafted byte
  * streams exercising each gate and the stride map directly, next to
  * the q236 oracle that pins the same walk against DuckDB's replay of
  * the pixel formula. */
class AviDibProbeSpec extends AnyFunSuite {

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Minimal AVI: hdrl(avih + strl(strh fccType, strf w/h/bits/comp)),
    * then movi with the given chunks. */
  private def avi(w: Int, h: Int, bits: Int = 24, comp: Int = 0,
                  fccType: String = "vids",
                  movi: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val strf = fcc("strf") ++ le(40, 4) ++
      le(40, 4) ++ le(w, 4) ++ le(h, 4) ++ le(1, 2) ++ le(bits, 2) ++
      le(comp, 4) ++ le(0, 4) ++ le(0, 4) ++ le(0, 4) ++ le(0, 4) ++ le(0, 4)
    val strh = fcc("strh") ++ le(56, 4) ++ fcc(fccType) ++ fcc("DIB ") ++
      Array.fill[Byte](48)(0)
    val strl = fcc("LIST") ++ le(4 + strh.length + strf.length, 4) ++
      fcc("strl") ++ strh ++ strf
    val avih = fcc("avih") ++ le(56, 4) ++ Array.fill[Byte](56)(0)
    val hdrl = fcc("LIST") ++ le(4 + avih.length + strl.length, 4) ++
      fcc("hdrl") ++ avih ++ strl
    val moviL = fcc("LIST") ++ le(4 + movi.length, 4) ++ fcc("movi") ++ movi
    val body = fcc("AVI ") ++ hdrl ++ moviL
    fcc("RIFF") ++ le(body.length, 4) ++ body
  }

  private def frame(id: String, payload: Array[Byte],
                    declared: Int = -1): Array[Byte] =
    fcc(id) ++ le(if (declared < 0) payload.length else declared, 4) ++
      payload ++
      (if (declared < 0 && payload.length % 2 == 1) Array[Byte](0)
       else Array.emptyByteArray)

  test("2x2 single frame: stride pads never enter the sums") {
    // w=2: rowBytes 6, stride 8 — rows [1,2,3,4,5,6,POISON,POISON]
    val row0 = Array[Byte](1, 2, 3, 4, 5, 6, -1, -1)
    val row1 = Array[Byte](7, 8, 9, 10, 11, 12, -1, -1)
    val r = AviDibProbe.probeToRow(avi(2, 2, movi = frame("00db", row0 ++ row1)))
    assert(r.getBoolean(0))
    assert(r.getLong(6) === 1L)            // n_frames
    assert(r.getLong(7) === 4L)            // n_px
    assert(r.getLong(8) === 1L + 4 + 7 + 10)  // sum_b
    assert(r.getLong(9) === 2L + 5 + 8 + 11)  // sum_g
    assert(r.getLong(10) === 3L + 6 + 9 + 12) // sum_r
    assert(r.getLong(11) === 1L + 16 + 49 + 100) // sq_b
  }

  test("two frames fuse; audio and JUNK chunks inside movi are skipped") {
    val px = Array[Byte](1, 2, 3, 0) // w=1: rowBytes 3, stride 4
    val movi = frame("01wb", Array[Byte](9, 9, 9)) ++ // odd → padded
      frame("00db", px) ++ frame("JUNK", Array[Byte](5)) ++ frame("00db", px)
    val r = AviDibProbe.probeToRow(avi(1, 1, movi = movi))
    assert(r.getBoolean(0))
    assert(r.getLong(6) === 2L)
    assert(r.getLong(8) === 2L && r.getLong(9) === 4L && r.getLong(10) === 6L)
  }

  test("gates: compressed, depth, dims, missing strf, no frames, not avi") {
    def reason(r: org.apache.spark.sql.catalyst.expressions.GenericInternalRow) =
      if (r.isNullAt(1)) null else r.getUTF8String(1).toString
    assert(reason(AviDibProbe.probeToRow(avi(2, 2, comp = 1))) === "compressed")
    assert(reason(AviDibProbe.probeToRow(avi(2, 2, bits = 8))) ===
      "unsupported_depth")
    assert(reason(AviDibProbe.probeToRow(avi(0, 2))) === "bad_dims")
    assert(reason(AviDibProbe.probeToRow(avi(2, 2, fccType = "auds"))) ===
      "no_strf")
    assert(reason(AviDibProbe.probeToRow(avi(2, 2))) === "no_frames")
    assert(reason(AviDibProbe.probeToRow("notaviatall".getBytes)) === "not_avi")
    assert(reason(AviDibProbe.probeToRow(Array[Byte](1, 2))) === "not_avi")
  }

  test("declared frame size vs strf dims mismatch censuses bad_frame_size") {
    val r = AviDibProbe.probeToRow(
      avi(2, 2, movi = frame("00db", Array.fill[Byte](12)(1)))) // needs 16
    assert(!r.getBoolean(0))
    assert(r.getUTF8String(1).toString === "bad_frame_size")
  }

  test("frame payload cut by the buffer end censuses trunc_frame with prefix count") {
    val full = frame("00db", Array.fill[Byte](16)(1)) // w=2,h=2 → 16
    val cut = fcc("00db") ++ le(16, 4) ++ Array.fill[Byte](8)(1)
    val r = AviDibProbe.probeToRow(avi(2, 2, movi = full ++ cut))
    assert(!r.getBoolean(0))
    assert(r.getUTF8String(1).toString === "trunc_frame")
    assert(r.getLong(6) === 1L) // one complete frame walked
    assert(r.isNullAt(8))       // stats withheld
  }

  test("naive contiguous read would differ: poison in pads is observable") {
    // same bytes as the 2x2 test but with zero pads — sums identical,
    // proving pads (whatever their value) never contribute
    val clean = Array[Byte](1, 2, 3, 4, 5, 6, 0, 0, 7, 8, 9, 10, 11, 12, 0, 0)
    val poison = Array[Byte](1, 2, 3, 4, 5, 6, -1, -1, 7, 8, 9, 10, 11, 12, -1, -1)
    val a = AviDibProbe.probeToRow(avi(2, 2, movi = frame("00db", clean)))
    val b = AviDibProbe.probeToRow(avi(2, 2, movi = frame("00db", poison)))
    (8 to 13).foreach(i => assert(a.getLong(i) === b.getLong(i)))
  }
}

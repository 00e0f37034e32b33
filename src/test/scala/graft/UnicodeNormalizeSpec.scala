package graft

import org.apache.spark.sql.functions._

import graft.expressions.UnicodeNormalize

/** Pins the native Unicode-normalization expression: NFC composition,
  * NFKC compatibility folding, the already-normalized identity fast
  * path, null propagation — and that the same answers come out of the
  * codegen and interpreted paths (the q198 census rides this).
  *
  * All non-ASCII is written as \\u escapes: composed and decomposed
  * forms are visually identical, so raw literals here would be
  * unreviewable (and one editor round-trip away from silently
  * normalizing the test into a tautology). */
class UnicodeNormalizeSpec extends SparkSpec {

  import spark.implicits._

  private val CafeDecomposed = "cafe\u0301" // e + combining acute
  private val CafeComposed = "caf\u00e9"    // precomposed e-acute

  private def nfcOf(s: String): String =
    Seq(s).toDF("t").select(UnicodeNormalize.nfc(col("t"))).head.getString(0)

  test("NFC composes decomposed accent sequences") {
    assert(nfcOf(CafeDecomposed) == CafeComposed)
    assert(nfcOf("u\u0308ber") == "\u00fcber")
    assert(nfcOf("man\u0303ana") == "ma\u00f1ana")
    assert(CafeDecomposed.length == 5 && nfcOf(CafeDecomposed).length == 4)
  }

  test("already-NFC strings pass through unchanged (fast path)") {
    for (s <- Seq("plain ascii", CafeComposed, "",
      s"mixed $CafeComposed text"))
      assert(nfcOf(s) == s)
  }

  test("NFKC additionally folds compatibility forms; NFC leaves them") {
    val lig = "\uFB01le" // "fi" ligature + "le"
    val out = Seq(lig).toDF("t")
      .select(UnicodeNormalize.nfkc(col("t")).as("k"),
        UnicodeNormalize.nfc(col("t")).as("c")).head
    assert(out.getString(0) == "file")
    assert(out.getString(1) == lig)
  }

  test("null propagates; unsupported form rejected") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(UnicodeNormalize.nfc(col("t"))).head
    assert(r.isNullAt(0))
    intercept[IllegalArgumentException] {
      UnicodeNormalize(col("t"), "NFX")
    }
  }

  test("codegen and interpreted evaluation agree over a corpus slice") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .limit(50)
      .select(concat(col("text"),
        lit(s" $CafeDecomposed u\u0308 n\u0303")).as("t"))
    val expected = docs.collect().map(r =>
      java.text.Normalizer.normalize(r.getString(0),
        java.text.Normalizer.Form.NFC))
    val viaExpr = docs.select(UnicodeNormalize.nfc(col("t")))
      .collect().map(_.getString(0))
    assert(viaExpr.toSeq == expected.toSeq)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-function surface: native kernels callable from SQL, wired
  * either at build time (`withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.GraftExtensions`) or onto a running
  * session via `GraftExtensions.register` — which is what a shared test
  * session permits (getOrCreate ignores extensions on reuse). */
class GraftExtensionsSpec extends SparkSpec {

  GraftExtensions.register(TestSpark.spark)

  test("vector_dot and cosine_sim from SQL") {
    val r = spark.sql(
      """SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS c
        |""".stripMargin).head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 1.0)
  }

  test("simhash64 and minhash_signature from SQL match the Column API") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(
      array(lit(7L), lit(99L), lit(12345L)).as("hs"))
    val sqlSig = df.selectExpr("simhash64(hs) AS s",
      "minhash_signature(hs, 8, 42) AS m").head()
    val apiSig = df.select(
      expressions.HashExpressions.simhash64(col("hs")).as("s"),
      expressions.HashExpressions.minhash_signature(col("hs"),
        dedup.Dedup.mixConstants(8, 42L).map(_._1).toArray,
        dedup.Dedup.mixConstants(8, 42L).map(_._2).toArray).as("m")).head()
    assert(sqlSig.getLong(0) === apiSig.getLong(0))
    assert(sqlSig.getSeq[Long](1) === apiSig.getSeq[Long](1))
  }

  test("token_set_count from SQL with a literal dictionary") {
    val n = spark.sql(
      "SELECT token_set_count(array('The', 'fox', 'the'), array('the'), true) AS n")
      .head().getInt(0)
    assert(n === 2)
  }

  test("unicode_normalize from SQL: NFC composes, bad form rejected") {
    val r = spark.sql(
      "SELECT unicode_normalize('café', 'NFC') AS c," +
        " length(unicode_normalize('café', 'NFC')) AS n").head()
    assert(r.getString(0) == "caf\u00e9" && r.getInt(1) == 4)
    intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'BOGUS')").head()
    }
    // a NULL string literal for the form must hit the same loud error
    // path (expected-a-literal-string), not NPE in the builder
    val e = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', CAST(NULL AS STRING))").head()
    }
    assert(e.getMessage.contains("literal string") ||
      Option(e.getCause).exists(_.getMessage.contains("literal string")))
  }

  test("media header parsers from SQL match the Column API") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.multimodal.Multimodal
    val docs = (0L until 50L).map(i => (i, s"doc body $i"))
      .toDF("doc_id", "text")
    // WAV: SQL function vs Column API over the same synthetic corpus
    val wav = Multimodal.syntheticWav(docs)
    wav.createOrReplaceTempView("gx_wav")
    val viaSql = spark.sql(
      "SELECT media_id, parse_wav_header(media) AS m FROM gx_wav")
      .select("media_id", "m.format", "m.sample_rate", "m.n_samples")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.get(2), r.get(3))).toMap
    val viaApi = wav.select(col("media_id"),
      Multimodal.parseWavHeader(col("media")).as("m"))
      .select("media_id", "m.format", "m.sample_rate", "m.n_samples")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.get(2), r.get(3))).toMap
    assert(viaSql === viaApi)
    // image + avi: smoke via selectExpr on one payload each
    val img = Multimodal.syntheticMedia(docs.filter(col("doc_id") === 2))
      .selectExpr("parse_image_header(media) AS m").select("m.format").head()
    assert(img.getString(0) === "png")
    val avi = Multimodal.syntheticAvi(docs.filter(col("doc_id") === 2))
      .selectExpr("parse_avi_header(media) AS m").select("m.format", "m.width").head()
    assert(avi.getString(0) === "avi" && avi.getLong(1) === 162L)
    val mp4 = Multimodal.syntheticMp4(docs.filter(col("doc_id") === 2))
      .selectExpr("parse_mp4_header(media) AS m")
      .select("m.format", "m.timescale").head()
    assert(mp4.getString(0) === "mp4" && mp4.getLong(1) === 90000L)
  }

  test("non-literal kernel parameters are rejected") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array(1L), id + 1, 42) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pathological-corpus twin of QueriesSmokeSpec: every SparkEntry query
  * must EXECUTE (not just plan) against a corpus seeded with the inputs
  * real 100 TB crawls actually contain — empty and whitespace-only
  * documents, NULL text/lang/source, one-token and single-repeated-token
  * docs, combining-character unicode, CRLF/tab whitespace, zero-norm /
  * NaN / Infinity / null embeddings, duplicate-timestamp events and
  * malformed JSON props. Degenerate inputs may legitimately produce
  * empty or null-bearing results; they must never throw. (This is the
  * bug class the round-6 advisor caught by inspection in the trigram
  * builder — sequence(1,0) stepping backwards on short docs; this spec
  * makes the whole inventory immune by execution.)
  */
object EdgeCorpus {
  val dir = "/tmp/graft_edge_corpus"

  /** Build once per JVM: 8 real rows of every table (schema + FK shape)
    * plus the crafted pathological rows for the LLM-pipeline tables. */
  lazy val built: String = {
    val spark = TestSpark.spark
    val base = TestSpark.sf0001
    import spark.implicits._

    Tables.names.foreach { t =>
      // the PQ/IVF trainers legitimately require >= ksub (256) usable
      // vectors, so embeddings keeps the full sf0.001 table
      val realAll = Tables.load(spark, base, t)
      val real = if (t == "embeddings") realAll else realAll.limit(8)
      val out = t match {
        case "documents" =>
          val extra = Seq[(Long, String, String, String, java.lang.Long)](
            (9000L, "", "en", "edge", 0L),
            (9001L, " \t\n  \r\n ", null, "edge", 7L),
            (9002L, "x", "en", null, 1L),
            (9003L, null, null, null, null),
            (9004L, Array.fill(200)("a").mkString(" "), "en", "edge", 399L),
            (9005L, "café café ñ � 𝕊 " +
              "क्ष très naïve", "hi", "edge", 40L),
            (9006L, (0 until 5000).map(i => s"tok${i % 97}").mkString(" "),
              "en", "edge", 30000L),
            (9007L, "tab\tseparated\ttokens\r\nwindows line endings",
              "en", "edge", 43L))
            .toDF("doc_id", "text", "lang", "source", "n_chars")
          real.unionByName(extra)
        case "embeddings" =>
          val dim = 64
          val rows = Seq(
            Row(9000L, Array.fill(dim)(0.0f).toSeq, 0),
            Row(9001L, Array.fill(dim)(1.0f).toSeq, null),
            Row(9002L, (Array.fill(dim - 2)(0.1f) ++
              Array(Float.NaN, Float.PositiveInfinity)).toSeq, 1),
            Row(9003L, null, 2),
            Row(9004L, Array.fill(dim)(1e-30f).toSeq, 3),
            // finite but beyond micronize's exact-BIGINT domain
            // (|x| >= 9e12): finiteVec must EXCLUDE it, not null it
            Row(9005L, (Array.fill(dim - 1)(0.1f) ++
              Array(9.5e12f)).toSeq, 4))
          val schema = StructType(Seq(
            StructField("vec_id", LongType),
            StructField("embedding", ArrayType(FloatType)),
            StructField("label", IntegerType)))
          real.unionByName(
            spark.createDataFrame(spark.sparkContext.parallelize(rows), schema))
        case "events" =>
          val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
          val extra = Seq[(Long, java.sql.Timestamp, java.lang.Long, String,
            java.lang.Double, String)](
            (9000L, t0, 1L, "error", null, "not json"),
            (9001L, t0, 1L, "error", 0.0, "{\"k\": 1}"),
            (9002L, t0, null, null, Double.NaN, null))
            .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          real.unionByName(extra)
        case _ => real
      }
      out.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/$t.parquet")
    }
    dir
  }
}

class EdgeSweepSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name survives the pathological corpus") {
      val d = EdgeCorpus.built
      val df: DataFrame = fn(spark, d)
      assert(df.count() >= 0)
    }
  }

  test("dirty media bytes: every parser is total and the census accounts for every row") {
    import graft.multimodal.Multimodal
    val d = EdgeCorpus.built
    val docs = Tables.load(spark, d, "documents")
      .filter(col("doc_id") < 8 && col("text").isNotNull)
    def bytesOf(df: DataFrame): Seq[Array[Byte]] =
      df.select(col("media")).collect().map(_.getAs[Array[Byte]](0)).toSeq
    // every synthesized format, built over REAL header/payload bytes
    val valid = bytesOf(Multimodal.syntheticBmp(docs)) ++
      bytesOf(Multimodal.syntheticWav(docs)) ++
      bytesOf(Multimodal.syntheticAvi(docs)) ++
      bytesOf(Multimodal.syntheticMp4(docs)) ++
      bytesOf(Multimodal.syntheticMedia(docs))
    // the crawl's reality: every valid payload also arrives truncated
    // at the magic, inside the header, and mid-payload …
    val truncated = valid.flatMap(b =>
      Seq(b.take(2), b.take(10), b.take(math.max(1, b.length / 2))))
    // … plus right-magic-wrong-structure and pure garbage
    def ascii(s: String) = s.getBytes("ISO-8859-1")
    val crafted = Seq(
      ascii("BM") ++ Array.fill[Byte](60)(0),             // BM magic, zero header
      ascii("RIFF") ++ Array.fill[Byte](4)(9) ++ ascii("WAVE") ++
        Array.fill[Byte](40)(7),                          // WAVE, no fmt/data
      ascii("RIFF") ++ Array.fill[Byte](4)(9) ++ ascii("AVI ") ++
        Array.fill[Byte](80)(3),                          // AVI, no hdrl
      Array[Byte](0, 0, 0, 0) ++ ascii("ftyp") ++
        Array.fill[Byte](24)(1),                          // mp4 box size 0 (loop bait)
      Array[Byte](0x7F, -1, -1, -1) ++ ascii("ftyp") ++
        Array.fill[Byte](24)(1),                          // absurd box size
      Array[Byte](-119) ++ ascii("PNG\r\n") ++ Array[Byte](0x1A, 0x0A) ++
        Array.fill[Byte](5)(0),                           // PNG magic, no IHDR
      Array[Byte](-1, -40),                               // JPEG SOI alone
      Array[Byte](-1, -40) ++ Array.fill[Byte](62)(-1),   // SOI + FF flood
      Array.tabulate[Byte](128)(i => ((i * 131 + 17) % 251).toByte), // garbage
      Array.emptyByteArray)
    val all: Seq[Array[Byte]] = valid ++ truncated ++ crafted
    val rows = all.zipWithIndex.map { case (b, i) => Row(i.toLong, b) } :+
      Row(99999L, null)
    val schema = StructType(Seq(StructField("media_id", LongType),
      StructField("media", BinaryType)))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)

    // totality: every parser evaluates every struct field on every row
    // (collect, not count — count would prune the parse columns away)
    val parsed = media.select(
      Multimodal.parseImageHeader(col("media")).as("img"),
      Multimodal.parseWavHeader(col("media")).as("wav"),
      Multimodal.parseAviHeader(col("media")).as("avi"),
      Multimodal.parseMp4Header(col("media")).as("mp4"),
      Multimodal.parseWavPcm(col("media")).as("pcm"),
      Multimodal.parseBmp(col("media")).as("bmp")).collect()
    assert(parsed.length === rows.length)

    // the decode chains run over whatever survives their own gates
    val bmpOk = media.select(col("media_id"), col("media"),
        Multimodal.parseBmp(col("media")).as("p"))
      .filter(col("p.valid"))
      .select(col("media_id"), col("media"), col("p.data_off").as("o"),
        col("p.width").as("w"), col("p.height").as("h"))
    val hashed = bmpOk.select(col("media_id"),
      Multimodal.bmpAHash(col("media"), col("o"), col("w"), col("h"),
        Multimodal.bmpLumSum(col("media"), col("o"), col("w"), col("h")))
        .as("ahash"),
      Multimodal.bmpChannelStats(col("media"), col("o"), col("w"), col("h"))
        .as("st")).collect()
    assert(hashed.nonEmpty && hashed.forall(r => !r.isNullAt(1)))

    // the census is the q213-style accounting: every row lands in
    // exactly one bucket, exclusions observable, nothing poisoned
    val cen = Multimodal.mediaValidityCensus(media, lit(0), col("media"))
      .collect().head
    val Seq(nMedia, nNull, nEmpty, nPng, nJpeg, nBmp, nWav, nAvi, nMp4,
      nUnknown) = (1 to 10).map(cen.getLong)
    assert(nMedia === rows.length.toLong)
    assert(nNull === 1L && nEmpty === 1L)
    assert(nNull + nEmpty + nPng + nJpeg + nBmp + nWav + nAvi + nMp4 +
      nUnknown === nMedia, "census buckets must partition the corpus")
    // each synthesized format is claimed by its parser (doc 0 takes the
    // deliberate headerless branch in some builders, hence >= 6)
    Seq("bmp" -> nBmp, "wav" -> nWav, "avi" -> nAvi, "mp4" -> nMp4)
      .foreach { case (f, n) => assert(n >= 6L, s"$f claimed only $n") }
    assert(nPng >= 2L && nJpeg >= 2L)
    assert(nUnknown >= crafted.length.toLong - 2L,
      "garbage and wrong-structure bytes must land in n_unknown")
  }

  test("validity census counts exactly the rows the hygiene filter excludes") {
    val d = EdgeCorpus.built
    val e = Tables.load(spark, d, "embeddings")
    val r = graft.similarity.Similarity
      .vectorValidityCensus(e, lit(0), col("embedding")).collect().head
    // crafted rows: 9002 carries NaN+Inf, 9003 is a null vector,
    // 9005 is finite-but-unmicronizable (9.5e12 component)
    assert(r.getLong(1) === 506L, "n_vecs")
    assert(r.getLong(2) === 1L, "n_null_vec")
    assert(r.getLong(3) === 0L, "n_null_comp")
    assert(r.getLong(4) === 1L, "n_nan")
    assert(r.getLong(5) === 1L, "n_inf")
    assert(r.getLong(6) === 1L, "n_huge")
    assert(r.getLong(7) === 503L, "n_usable")
    val kept = e.filter(graft.similarity.Similarity.finiteVec(col("embedding"))).count()
    assert(kept === r.getLong(7), "finiteVec keeps exactly n_usable rows")
  }
}

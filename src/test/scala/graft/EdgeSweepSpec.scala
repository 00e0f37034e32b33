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

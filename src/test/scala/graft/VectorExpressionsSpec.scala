package graft

import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions
import graft.similarity.Similarity

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  lazy val pairs = Tables.load(spark, TestSpark.sf0001, "embeddings")
    .select(col("vec_id").as("ida"), col("embedding").as("a"))
    .crossJoin(Tables.load(spark, TestSpark.sf0001, "embeddings")
      .select(col("vec_id").as("idb"), col("embedding").as("b"))
      .limit(5))

  test("native DotProduct ≡ HOF zip_with/aggregate, bitwise, on real data") {
    val diff = pairs.select(
      (Similarity.dot(col("a"), col("b")) - Similarity.dotHof(col("a"), col("b")))
        .as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff === 0.0)
  }

  test("native CosineSimilarity ≡ HOF form, bitwise, on real data") {
    val diff = pairs.select(
      (Similarity.cosine(col("a"), col("b")) - Similarity.cosineHof(col("a"), col("b")))
        .as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff === 0.0)
  }

  test("interpreted eval path matches codegen (null arrays → null)") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f)))).toDF("a", "b")
    val got = df.select(VectorExpressions.vector_dot(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(Some(11.0), None))
  }

  test("double arrays and mixed lengths pair to shorter length") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(2.0, 2.0))).toDF("a", "b")
    assert(df.select(VectorExpressions.vector_dot(col("a"), col("b")))
      .head().getDouble(0) === 6.0)
  }

  test("TokenSetCount ≡ HOF filter/array_contains, occurrences not distinct") {
    val df = Seq("The the THE cat sat on a mat", "", "zzz yyy xxx")
      .toDF("text")
    val toks = split(trim(col("text")), "\\s+")
    val dict = Set("the", "a", "cat")
    val native = df.select(
      graft.expressions.TokenSetCount(toks, dict, lowercase = true).as("n"))
      .collect().map(_.getInt(0)).toSeq
    val hof = df.select(
      size(filter(toks, t => lower(t).isInCollection(dict))).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(native === hof)
    assert(native === Seq(5, 0, 0)) // "" splits to one empty token, 0 hits
  }

  test("SQL registration: vector_dot / cosine_sim usable from SQL text") {
    VectorExpressions.registerAll(spark)
    val r = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 1.0)
  }
}

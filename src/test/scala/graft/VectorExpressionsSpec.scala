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

  test("NearestCell ≡ the HOF argmax fold, ties to the lower cell") {
    val centroids = Array(
      Array(1.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0),
      Array(0.0, 1.0, 0.0), // duplicate of cell 1: equal score, must lose
      Array(0.5, 0.5, 0.0))
    val norms = centroids.map(_.map(x => x * x).sum)
    val vecs = Seq(
      Array(0.9f, 0.1f, 0.0f),   // → cell 0
      Array(0.1f, 0.9f, 0.0f),   // → cell 1 (2 is identical; lower id wins)
      Array(0.5f, 0.5f, 0.0f),   // → cell 3 exactly
      Array(0.0f, 0.0f, 1.0f))   // equidistant from nothing useful
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
    val native = df.select(col("id"),
      VectorExpressions.nearest_cell(col("v"), centroids, norms).as("c"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    // HOF reference: the fold NearestCell replaced
    val cLit = typedLit(centroids.map(_.toSeq).toSeq)
    val nLit = typedLit(norms.toSeq)
    val hof = df.select(col("id"),
      aggregate(
        sequence(lit(0), lit(centroids.length - 1)),
        struct(lit(Double.NegativeInfinity).as("s"), lit(-1).as("cell")),
        (acc, i) => {
          val nd = graft.similarity.Similarity.dot(col("v"),
            element_at(cLit, i + lit(1))) * 2.0 - element_at(nLit, i + lit(1))
          val better = nd > acc.getField("s")
          struct(when(better, nd).otherwise(acc.getField("s")).as("s"),
            when(better, i).otherwise(acc.getField("cell")).as("cell"))
        },
        acc => acc.getField("cell")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(native === hof)
    assert(native(0) === 0 && native(1) === 1 && native(2) === 3)
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

package graft

import org.apache.spark.sql.functions._

import graft.expressions.SortedIntersect.sorted_intersect_at_least

/** Pins [[graft.expressions.SortedIntersectAtLeast]] — the verification
  * primitive behind the prefix-filtered exact sim-joins (q211/q234 and
  * the census twins q239/q240): exactness vs `size(array_intersect)` on
  * real corpus pairs, the early-exit sentinel contract (−1 iff the true
  * count is below `need`, never a wrong count), and null handling on
  * both the array and element levels.
  */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  private def sortedToks(alias: String) =
    Tables.load(spark, TestSpark.sf0001, "documents")
      .select(col("doc_id").as(s"id_$alias"),
        sort_array(array_distinct(
          graft.text.TextAnalysis.ngrams(
            graft.text.TextAnalysis.tokens(col("text")), 3))).as(alias))

  private lazy val realPairs =
    sortedToks("a").limit(40).crossJoin(sortedToks("b").limit(40))

  test("need=0 ≡ size(array_intersect) on real corpus pairs") {
    val bad = realPairs.select(
      sorted_intersect_at_least(col("a"), col("b"), lit(0L)).as("merge"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("hash"))
      .filter(col("merge") =!= col("hash")).count()
    assert(bad === 0L)
  }

  test("early-exit sentinel: -1 exactly when the true count < need") {
    // sweep need over 0..sz so both branches (exact count / sentinel)
    // are exercised on every pair
    val bad = realPairs
      .withColumn("need",
        explode(sequence(lit(0L), least(size(col("a")), size(col("b"))).cast("long"))))
      .select(
        sorted_intersect_at_least(col("a"), col("b"), col("need")).as("merge"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("true_i"),
        col("need"))
      .filter(
        (col("true_i") >= col("need") && col("merge") =!= col("true_i")) ||
          (col("true_i") < col("need") && col("merge") =!= lit(-1L)))
      .count()
    assert(bad === 0L)
  }

  test("null array or null need → null; empty arrays → 0") {
    val df = Seq(
      (Some(Seq("a", "b")), Some(Seq("b", "c")), Some(0L)),
      (None, Some(Seq("a")), Some(0L)),
      (Some(Seq("a")), None, Some(0L)),
      (Some(Seq("a")), Some(Seq("a")), None),
      (Some(Seq.empty[String]), Some(Seq.empty[String]), Some(0L)))
      .toDF("a", "b", "need")
    val got = df.select(
      sorted_intersect_at_least(col("a"), col("b"), col("need")).as("i"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq === Seq(Some(1L), None, None, None, Some(0L)))
  }

  test("null ELEMENTS match array_intersect: null in both counts once") {
    // sort_array puts nulls first — the expression's documented input
    val df = Seq(
      (Seq[String](null, "a", "b"), Seq[String](null, "b")),
      (Seq[String](null, "a"), Seq[String]("a", "b")),
      (Seq[String](null, "x"), Seq[String](null, "y")))
      .toDF("ra", "rb")
      .select(sort_array(col("ra")).as("a"), sort_array(col("rb")).as("b"))
    val bad = df.select(
      sorted_intersect_at_least(col("a"), col("b"), lit(0L)).as("merge"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("hash"))
      .filter(col("merge") =!= col("hash")).count()
    assert(bad === 0L)
  }

  test("interpreted eval matches codegen") {
    val df = Seq((Seq("a", "b", "c", "e"), Seq("b", "c", "d"), 2L))
      .toDF("a", "b", "need")
    val viaCodegen = df
      .select(sorted_intersect_at_least(col("a"), col("b"), col("need")).as("i"))
      .head().getLong(0)
    val e = graft.expressions.SortedIntersectAtLeast(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("a", "b", "c", "e"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("b", "c", "d"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal(2L))
    assert(viaCodegen === 2L && e.eval(null) === 2L)
  }
}

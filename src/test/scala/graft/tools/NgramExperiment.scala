package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Compare bigram formulations. Test/runMain graft.tools.NgramExperiment */
object NgramExperiment {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[32]", 32, "ngram-exp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables.load(spark, "/root/testdata/sf0.1", "documents")

    def time(label: String)(df: => DataFrame): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"$label rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val toks = split(trim(col("text")), "\\s+")

    time("element_at") {
      val grams = when(size(toks) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      d.select(explode(grams).as("ngram")).groupBy("ngram").agg(count(lit(1)).as("n"))
    }

    time("slice") {
      val grams = when(size(toks) < 2, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", slice(toks, i, lit(2)))))
      d.select(explode(grams).as("ngram")).groupBy("ngram").agg(count(lit(1)).as("n"))
    }

    time("zip_with") {
      val grams = array_compact(zip_with(toks,
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (x, y) => concat(x, lit(" "), y)))
      d.select(explode(grams).as("ngram")).groupBy("ngram").agg(count(lit(1)).as("n"))
    }

    time("zip_with_pretok") {
      val grams = array_compact(zip_with(col("__toks"),
        slice(col("__toks"), lit(2), greatest(size(col("__toks")) - 1, lit(0))),
        (x, y) => concat(x, lit(" "), y)))
      d.withColumn("__toks", toks)
        .select(explode(grams).as("ngram")).groupBy("ngram").agg(count(lit(1)).as("n"))
    }
    spark.stop()
  }
}

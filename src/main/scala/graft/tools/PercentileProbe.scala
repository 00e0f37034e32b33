package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** Throwaway measurement harness for the round-11 adaptive percentile
  * cut-over: times the sketch action and the main job of
  * Stats.groupedPercentilesExact separately, against the retired
  * buffered `percentile` shape, so the cut-over attacks the measured
  * constant instead of a guessed one. Not part of any query; removed
  * or kept as a diagnostic main only.
  */
object PercentileProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.builder("local[32]", 32, "pctl-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    Tables.load(spark, dir, "customer").agg(sum("c_acctbal")).collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val ps = Seq(0.25, 0.5, 0.75, 0.99)
    for (round <- 1 to 3) {
      println(s"--- round $round")
      // the full current construction (sketch + bucketed rank)
      time("full groupedPercentilesExact (q13 shape)") {
        graft.analytics.Stats.groupedPercentilesExact(
          Tables.load(spark, dir, "customer"), lit(1), col("c_acctbal"), ps)
          .write.mode("overwrite").format("noop").save()
      }
      // sketch action alone
      time("  sketch (limit 128k approxQuantile)") {
        Tables.load(spark, dir, "customer")
          .select(col("c_acctbal").cast("double").as("v"))
          .limit(1 << 17).stat.approxQuantile("v",
            (1 until 8).map(_.toDouble / 8).toArray, 0.01)
      }
      // single-stage variant: buckets = 1 (no sketch, offsets trivial)
      time("  buckets=1 construction") {
        graft.analytics.Stats.groupedPercentilesExact(
          Tables.load(spark, dir, "customer"), lit(1), col("c_acctbal"), ps,
          buckets = 1)
          .write.mode("overwrite").format("noop").save()
      }
      // the retired buffered percentile, for the floor
      time("  buffered percentile aggregate") {
        Tables.load(spark, dir, "customer")
          .agg(expr("percentile(c_acctbal, array(0.25, 0.5, 0.75, 0.99))"))
          .write.mode("overwrite").format("noop").save()
      }
      // grouped shape (q64-like): lineitem by returnflag
      time("full grouped (q225 shape, lineitem)") {
        graft.analytics.Stats.groupedPercentilesExact(
          Tables.load(spark, dir, "lineitem"), col("l_returnflag"),
          col("l_extendedprice"), ps)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}

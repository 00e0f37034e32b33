// Plan audit: run with  sbt -batch "Test/runMain graft.tools.ExplainAudit"
package graft.tools



import graft.SparkEntry

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[8]", 8, "explain-audit")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val interesting = args.headOption
      .map(_.split(",").toSeq)
      .getOrElse(Seq("q01_scan_filter", "q04_group_agg", "q05_star_join",
        "q08_window_rank", "q10_topk", "q16_kpi_global", "q31_knn_brute",
        "q56_exists_subquery", "q62_range_join", "q73_group_topk"))
    interesting.foreach { q =>
      println(s"\n========== $q ==========")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

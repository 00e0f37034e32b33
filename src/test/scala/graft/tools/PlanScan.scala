package graft.tools



import graft.SparkEntry

/** Scan every query's physical plan for expensive operators.
  * Test/runMain graft.tools.PlanScan */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[8]", 8, "plan-scan")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "NestedLoop" -> plan.contains("BroadcastNestedLoopJoin"),
          "SortMergeJoin" -> plan.contains("SortMergeJoin"),
          "ShuffleExchanges" -> false).collect { case (f, true) => f }
        val nShuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
        println(f"$name%-26s shuffles=$nShuffles ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"$name PLAN-ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}

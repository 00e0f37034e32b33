package graft

/** Fleet-wide physical-plan audit: every SparkEntry query must PLAN at
  * sf0.001 (catches analysis regressions without executing anything),
  * and no plan may contain an unbroadcast CartesianProduct — the
  * scalar-subquery crossJoins throughout the library broadcast a
  * 1-row/tiny side and plan as BroadcastNestedLoopJoin, which is the
  * at-scale-safe shape; CartesianProductExec (both sides shuffled,
  * |A|x|B| rows) appearing anywhere is a scale bug, not a style nit.
  */
class PlanAuditSpec extends SparkSpec {

  test("all queries plan at sf0.001; no CartesianProduct anywhere") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, TestSpark.sf0001).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")}")
  }
}

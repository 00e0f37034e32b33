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

  test("no single-partition Window anywhere in the fleet") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, TestSpark.sf0001).queryExecution.optimizedPlan
          .collect {
            case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
          }
        if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"single-partition Window in: ${offenders.mkString(", ")}")
  }

  test("q209 incremental top-k: both rank passes are bounded-heap aggregates, no window") {
    val df = graft.queries.Curation
      .q209_incremental_topk(spark, TestSpark.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial pass — the map-side combine that caps shuffle at k/group
    assert(plan.contains("top_k_ids"), plan.take(2000))
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(!plan.contains("Window"),
      "q209 must not window-sort corpus-sized partitions")
  }

  test("q210 canonical assignment: n-row output, canonical <= doc, ball-consistent") {
    val df = graft.queries.Media
      .q210_ahash_canonical(spark, TestSpark.sf0001)
    val rows = df.collect()
    // one row per valid doc, never a pair list
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getLong(5) <= r.getLong(0), "canonical must be a min")
      assert(r.getBoolean(6) === (r.getLong(0) === r.getLong(5)))
    }
    // exact duplicates (same w, h, ahash) share one canonical
    val byGroup = rows.groupBy(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    byGroup.values.foreach { g =>
      assert(g.map(_.getLong(5)).distinct.length === 1)
    }
  }

  test("q158 key-skew census: top-10 plans as TakeOrderedAndProject; invariants hold") {
    val df = graft.queries.Extended.q158_key_skew(spark, TestSpark.sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the hottest-keys probe must be a bounded top-k, not a global sort
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("events.user_id", "lineitem.l_partkey", "lineitem.l_suppkey",
        "orders.o_custkey"))
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2))          // rows >= keys
      assert(r.getLong(3) >= 1L)                    // max key count
      assert(r.getDouble(4) >= 1.0 - 1e-9)          // imbalance >= 1
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }
}

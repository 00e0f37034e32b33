package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join at work (r2 verdict stretch item): the runtime
  * mechanism the engine leans on at 100 TB when a shuffle key is
  * pathological — AQE detects the oversized partition post-shuffle and
  * splits it across tasks, complementing the explicit
  * [[graft.operators.Operators.saltedJoin]] (compile-time salting) the
  * repo already pins. This spec asserts the FINAL adaptive plan marks
  * the join skew=true, i.e. the split actually happened, not just that
  * the configs exist.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the skewed partition of a sort-merge join (skew=true in final plan)") {
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-scale thresholds: a partition is skewed if > 128 KiB and
      // > 1× median; split targets of 64 KiB. Production keeps the
      // defaults (256 MiB / 5× median).
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // ~90% of 300k rows land on key 0; dim side is uniform
      val skewed = spark.range(300000).select(
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 5000).as("k"),
        col("id").as("v"))
      val dim = spark.range(5000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = skewed.join(dim, "k")
      assert(joined.count() === 300000)
      joined.collect() // materialize THIS DataFrame's adaptive execution
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }
      assert(adaptive.isDefined, "expected an adaptive plan root")
      // QueryStageExec nodes have no children, so TreeNode.collect can't
      // reach inside materialized stages — assert on the rendered final
      // plan, where the join prints `SortMergeJoin(skew=true)` and the
      // skewed side prints `AQEShuffleRead skewed`
      val finalPlan = adaptive.get.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew=true join in final adaptive plan:\n$finalPlan")
      assert(finalPlan.contains("AQEShuffleRead skewed"),
        s"no skewed shuffle read in final adaptive plan:\n$finalPlan")
    } finally prev.foreach { case (k, vOpt) =>
      vOpt match {
        case Some(v) => spark.conf.set(k, v)
        case None => spark.conf.unset(k)
      }
    }
  }
}

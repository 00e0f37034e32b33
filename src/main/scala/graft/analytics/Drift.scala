package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection: exact two-sample Kolmogorov–Smirnov
  * statistics between every pair of groups — the data-quality gate
  * that catches a source whose length/score distribution shifted
  * between snapshots or diverges from its peers.
  *
  * The KS numerator is kept EXACT: for samples a (size n_a) and b
  * (size n_b), D = max|F_a−F_b| = max|cum_a·n_b − cum_b·n_a|/(n_a·n_b),
  * and the BIGINT numerator max|cum_a·n_b − cum_b·n_a| is computed in
  * integer arithmetic — hash-stable across engines (the double `ks` is
  * derived from exact inputs at the very end). BIGINT bound: safe up
  * to ~3·10⁹ rows per group; larger groups switch the numerator to
  * DECIMAL(38,0).
  *
  * 100 TB shape: the corpus collapses FIRST to (group, value, count) —
  * value-compressed, so everything after is bounded by
  * #groups² · #distinct-values, not row count. ECDF running sums use a
  * window partitioned per group-PAIR (bounded by distinct metric
  * values of a discrete measure, never corpus-sized); pair fan-out is
  * two equi-joins against a broadcast pair list, no non-equi join.
  */
object Drift {

  /** All-pairs KS: (grp_a, grp_b, n_a, n_b, ks_num, ks) with
    * grp_a < grp_b, ks = ks_num/(n_a·n_b) rounded to 6 dp. */
  def ksPairs(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame = {
    val cnt = df.select(groupCol.as("grp"), valueCol.as("value"))
      .groupBy("grp", "value").agg(count(lit(1)).as("c"))
    val groups = cnt.select("grp").distinct()
    val pairs = groups.select(col("grp").as("grp_a"))
      .crossJoin(groups.select(col("grp").as("grp_b")))
      .filter(col("grp_a") < col("grp_b"))
    val sideA = cnt.join(broadcast(pairs), col("grp") === col("grp_a"))
      .select(col("grp_a"), col("grp_b"), col("value"),
        col("c").as("ca"), lit(0L).as("cb"))
    val sideB = cnt.join(broadcast(pairs), col("grp") === col("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("value"),
        lit(0L).as("ca"), col("c").as("cb"))
    val merged = sideA.unionAll(sideB)
      .groupBy("grp_a", "grp_b", "value")
      .agg(sum("ca").as("ca"), sum("cb").as("cb"))
    val pairW = Window.partitionBy("grp_a", "grp_b")
    val runW = pairW.orderBy(col("value").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("cum_a", sum("ca").over(runW))
      .withColumn("cum_b", sum("cb").over(runW))
      .withColumn("n_a", sum("ca").over(pairW))
      .withColumn("n_b", sum("cb").over(pairW))
      .groupBy("grp_a", "grp_b")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
          .as("ks_num"))
      .withColumn("ks",
        round(col("ks_num").cast("double") / (col("n_a") * col("n_b")), 6))
  }
}

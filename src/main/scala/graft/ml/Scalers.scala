package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature scaling (SURVEY §2.4 A16): fit = one aggregate pass,
  * transform = codegen'd per-row arithmetic. Engine-native (plain
  * column algebra) rather than spark.ml so the transform composes into
  * any plan without vector assembly.
  */
object Scalers {

  /** z-standardize columns to mean 0 / std 1 (population std, matching
    * the reference EDA's StandardScaler usage). Zero-variance columns
    * scale to 0 rather than NaN. */
  def standardScale(df: DataFrame, cols: Seq[String], suffix: String = "_std"): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      avg(col(c)).as(s"__m_$c"), stddev_pop(col(c)).as(s"__s_$c")))
    val moments = df.agg(aggs.head, aggs.tail: _*)
    val out = cols.foldLeft(df.crossJoin(broadcast(moments))) { (d, c) =>
      d.withColumn(s"$c$suffix",
        when(col(s"__s_$c") === 0, 0.0)
          .otherwise((col(c) - col(s"__m_$c")) / col(s"__s_$c")))
    }
    out.drop(cols.flatMap(c => Seq(s"__m_$c", s"__s_$c")): _*)
  }

  /** Min-max scale columns to [0, 1]. Constant columns scale to 0. */
  def minMaxScale(df: DataFrame, cols: Seq[String], suffix: String = "_mm"): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"__lo_$c"), max(col(c)).as(s"__hi_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val out = cols.foldLeft(df.crossJoin(broadcast(bounds))) { (d, c) =>
      d.withColumn(s"$c$suffix",
        when(col(s"__hi_$c") === col(s"__lo_$c"), 0.0)
          .otherwise((col(c) - col(s"__lo_$c")) / (col(s"__hi_$c") - col(s"__lo_$c"))))
    }
    out.drop(cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }
}

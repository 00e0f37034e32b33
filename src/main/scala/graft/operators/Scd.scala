package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension build from an append-only change
  * log — the warehouse operator that turns "user 7 emitted event_type
  * X at t" into validity intervals `[valid_from, valid_to)` per key,
  * with the open interval marking the current value.
  *
  * Consecutive runs of the same attribute value collapse first (lag),
  * then each surviving change takes the next change's timestamp as its
  * exclusive end (lead). Both windows partition BY KEY — partition
  * size is one key's history, never table-sized — and the log is
  * touched exactly once with one shuffle on the key.
  */
object Scd {

  /** (all input columns) → key, attr, valid_from, valid_to, is_current.
    * `orderCols` must totally order events within a key (pass a
    * tiebreaker id alongside the timestamp). */
  def scd2(log: DataFrame, keyCol: Column, attrCol: Column,
           tsCol: Column, orderCols: Seq[Column]): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(orderCols.map(_.asc): _*)
    val changes = log
      .withColumn("__prev", lag(attrCol, 1).over(byKey))
      .filter(col("__prev").isNull || col("__prev") =!= attrCol)
    changes
      .withColumn("valid_from", tsCol)
      .withColumn("valid_to", lead(tsCol, 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev")
  }
}

package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Empirical first-order Markov transition matrix over per-key ordered
  * event sequences — the behavioral-modeling counterpart of the funnel
  * and sessionization operators: P(next event-type | current) across
  * every user's clickstream.
  *
  * 100 TB shape: one window (`lag`) PARTITIONED BY the sequence key —
  * partition size is one user's history, never table-sized — then a
  * map-side-combined count by (prev, next). The row-normalizer table
  * is O(|state space|) rows (tiny), joined back broadcast-style by
  * AQE. Probabilities are a single double division, 6dp-rounded, so
  * the matrix hash-replays in any engine.
  */
object Markov {

  /** (prev_state, next_state, n, p) for every observed transition,
    * where p = n / Σ n over the prev_state row. `order` must be a
    * total order within each key (add a tiebreak id column). */
  def transitions(df: DataFrame, key: Column, state: Column,
                  order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(order: _*)
    val steps = df.withColumn("__k", key).withColumn("__s", state)
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .filter(col("__prev").isNotNull)
    val counts = steps
      .groupBy(col("__prev").as("prev_state"), col("__s").as("next_state"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("prev_state").agg(sum("n").as("__row_n"))
    counts.join(totals, "prev_state")
      .select(col("prev_state"), col("next_state"), col("n"),
        round(col("n").cast("double") / col("__row_n"), 6).as("p"))
  }
}

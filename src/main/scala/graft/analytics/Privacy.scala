package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk measurement for release/training-data governance.
  *
  * k-anonymity (Sweeney 2002): a row's equivalence class is the set of
  * rows sharing its quasi-identifier tuple; a release is k-anonymous
  * when every class has at least k members. Classes of size 1–4 are
  * re-identification risks and drive suppression/generalization
  * decisions before data leaves the boundary.
  *
  * 100 TB shape: one map-side-combined aggregate keyed by the quasi
  * tuple (the only corpus-sized shuffle), then a class-count-sized
  * rollup — the histogram is bounded by the number of DISTINCT class
  * sizes, tiny at any scale. No per-row output leaves the cluster.
  */
object Privacy {

  /** Histogram of equivalence-class sizes: (k, n_classes, n_rows),
    * ascending k. `n_rows = k * n_classes` is the row mass at that
    * anonymity level; the release is k₀-anonymous iff min(k) ≥ k₀. */
  def kAnonymityHistogram(df: DataFrame, quasi: Seq[Column]): DataFrame = {
    val classes = df.groupBy(quasi: _*).agg(count(lit(1)).as("k"))
    classes.groupBy("k").agg(count(lit(1)).as("n_classes"))
      .select(col("k"), col("n_classes"),
        (col("k") * col("n_classes")).as("n_rows"))
  }

  /** The rows needing attention: members of classes smaller than
    * `minK`, tagged with their class size — the suppression worklist.
    * Shape: the histogram aggregate joined back on the quasi keys;
    * the small-class side is risk-sized, broadcastable. */
  def atRiskRows(df: DataFrame, quasi: Seq[Column], minK: Int): DataFrame = {
    val names = quasi.zipWithIndex.map { case (_, i) => s"__q$i" }
    val keyed = df.select(df.columns.map(col) ++
      quasi.zip(names).map { case (c, n) => c.as(n) }: _*)
    val small = keyed.groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("class_k"))
      .filter(col("class_k") < minK)
    keyed.join(broadcast(small), names, "inner")
      .drop(names: _*)
  }
}

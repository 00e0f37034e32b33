package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OLS linear regression, Spark-first.
  *
  * The reference trains `sklearn.linear_model.LinearRegression` on 5
  * features (`src/train_model.py:30-31`) and scores row-at-a-time with
  * the pickled model (`kafka/consumer.py:162-165`). Here:
  *
  *  - the **fit** is the closed-form normal-equations solve: one
  *    distributed aggregate computes the (p+1)×(p+1) Gram matrix XᵀX
  *    and XᵀY (sums of cross-products — map-side combinable, one
  *    shuffle of O(p²) doubles regardless of row count), then a tiny
  *    driver-side Gaussian elimination solves for the coefficients.
  *    At 100 TB this is exactly one pass over the data.
  *  - the **score** is a pure column expression `b + Σ cᵢ·xᵢ` with the
  *    coefficients as literals (constant-folded, codegen'd — no UDF,
  *    SURVEY §2.8 F10).
  *  - the **split** is a deterministic hash of the row key
  *    (`pmod(xxhash64(key, seed), 100) < frac·100`) — reproducible
  *    across jobs by construction, which is the property the reference
  *    actually relies on when producer and trainer re-derive the same
  *    RNG split (SURVEY §7.4.1).
  */
object Ols {

  final case class Model(features: Seq[String], coef: Array[Double], intercept: Double) {
    /** Scoring expression: b + Σ cᵢ·xᵢ — codegen-able, no UDF. */
    def scoreExpr: Column =
      features.zip(coef).map { case (f, c) => col(f) * lit(c) }
        .foldLeft(lit(intercept): Column)(_ + _)
  }

  /** Deterministic train/test flags from a hash of the key columns —
    * order-independent, engine-internal, stable across reruns and
    * programs (replaces sklearn's RNG split, SURVEY §7.4.1). */
  def withSplitFlags(df: DataFrame, keyCols: Seq[String],
                     trainFrac: Double = 0.7, seed: Long = 42L): DataFrame = {
    val bucket = pmod(xxhash64(keyCols.map(col) :+ lit(seed): _*), lit(100L))
    df.withColumn("is_train", when(bucket < (trainFrac * 100).toInt, 1).otherwise(0))
      .withColumn("is_test", when(bucket < (trainFrac * 100).toInt, 0).otherwise(1))
  }

  /** Fit by normal equations: solve (XᵀX)β = XᵀY with X = [1 | features].
    * One aggregate pass; p = features.size stays tiny (reference: 5). */
  def fit(df: DataFrame, features: Seq[String], target: String): Model = {
    val p = features.size
    val xs: Seq[Column] = lit(1.0) +: features.map(c => col(c).cast("double"))
    val y = col(target).cast("double")
    // upper triangle of XᵀX, then XᵀY
    val gramAggs =
      (for (i <- 0 to p; j <- i to p) yield sum(xs(i) * xs(j)).as(s"g_${i}_$j")) ++
        (0 to p).map(i => sum(xs(i) * y).as(s"b_$i"))
    val row = df.agg(gramAggs.head, gramAggs.tail: _*).head()
    val a = Array.ofDim[Double](p + 1, p + 2)
    for (i <- 0 to p; j <- i to p) {
      val v = row.getAs[Double](s"g_${i}_$j")
      a(i)(j) = v; a(j)(i) = v
    }
    for (i <- 0 to p) a(i)(p + 1) = row.getAs[Double](s"b_$i")
    // Gaussian elimination with partial pivoting on the (p+1)×(p+2) system
    for (c <- 0 to p) {
      val piv = (c to p).maxBy(r => math.abs(a(r)(c)))
      val t = a(c); a(c) = a(piv); a(piv) = t
      require(math.abs(a(c)(c)) > 1e-12, s"singular normal equations at col $c")
      for (r <- 0 to p if r != c) {
        val f = a(r)(c) / a(c)(c)
        for (k <- c to p + 1) a(r)(k) -= f * a(c)(k)
      }
    }
    val beta = (0 to p).map(i => a(i)(p + 1) / a(i)(i)).toArray
    Model(features, beta.drop(1), beta(0))
  }

  /** Fit on the is_train partition and score everything — the
    * reference's train+predict shape in one lazy plan + one fit pass. */
  def fitAndScore(df: DataFrame, features: Seq[String], target: String,
                  keyCols: Seq[String], seed: Long = 42L): (Model, DataFrame) = {
    val flagged = withSplitFlags(df, keyCols, 0.7, seed)
    val model = fit(flagged.filter(col("is_train") === 1), features, target)
    (model, flagged
      .withColumn("y_true", col(target))
      .withColumn("y_pred", model.scoreExpr))
  }
}

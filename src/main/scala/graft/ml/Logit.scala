package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic regression — the trainable document-quality
  * classifier (the fasttext-style replacement for hand-tuned gate
  * thresholds): learn weights over the quality features from labeled
  * examples, then score the corpus with a pure column expression.
  *
  * Training is Newton–Raphson (IRLS): each iteration is ONE
  * distributed aggregate computing the (p+1)² weighted Gram matrix
  * Xᵀ·diag(μ(1−μ))·X and the gradient Xᵀ(y−μ) — map-side combinable
  * sums of products, one shuffle of O(p²) doubles per round regardless
  * of row count (the [[Ols.fit]] shape, iterated) — followed by a tiny
  * driver-side solve. p stays small (quality features), iterations
  * ~8: at 100 TB the cost is 8 scans, each embarrassingly parallel.
  *
  * Scoring is `sigmoid(b + Σ wᵢxᵢ)` with literal weights —
  * constant-folded, codegen'd, no UDF — so a trained model ships as
  * five constants any engine can replay.
  */
object Logit {

  final case class Model(features: Seq[String], coef: Array[Double],
                         intercept: Double) {
    /** Linear part b + Σ wᵢ·xᵢ, left-to-right (oracle-reproducible). */
    def logitExpr: Column =
      features.zip(coef).map { case (f, c) => col(f) * lit(c) }
        .foldLeft(lit(intercept): Column)(_ + _)

    /** P(keep) = σ(logit) as a pure column expression. */
    def scoreExpr: Column = lit(1.0) / (lit(1.0) + exp(-logitExpr))
  }

  /** Newton–Raphson fit. `label` must be 0/1. `ridge` keeps the
    * Hessian invertible on separable data. */
  def fit(df: DataFrame, features: Seq[String], label: String,
          iters: Int = 8, ridge: Double = 1e-8): Model = {
    val p = features.size
    val xs: Seq[Column] = lit(1.0) +: features.map(c => col(c).cast("double"))
    val y = col(label).cast("double")
    var beta = Array.fill(p + 1)(0.0)
    for (_ <- 1 to iters) {
      val z = xs.zip(beta).map { case (x, b) => x * lit(b) }
        .reduceLeft(_ + _)
      val mu = lit(1.0) / (lit(1.0) + exp(-z))
      val wgt = mu * (lit(1.0) - mu) + lit(1e-10)
      val aggs =
        (for (i <- 0 to p; j <- i to p)
          yield sum(wgt * xs(i) * xs(j)).as(s"h_${i}_$j")) ++
          (0 to p).map(i => sum((y - mu) * xs(i)).as(s"g_$i"))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      val a = Array.ofDim[Double](p + 1, p + 2)
      for (i <- 0 to p; j <- i to p) {
        val v = row.getAs[Double](s"h_${i}_$j")
        a(i)(j) = v; a(j)(i) = v
      }
      for (i <- 0 to p) { a(i)(i) += ridge; a(i)(p + 1) = row.getAs[Double](s"g_$i") }
      val delta = solve(a, p)
      beta = beta.zip(delta).map { case (b, d) => b + d }
    }
    Model(features, beta.drop(1), beta(0))
  }

  /** Gaussian elimination with partial pivoting on (p+1)×(p+2). */
  private def solve(a: Array[Array[Double]], p: Int): Array[Double] = {
    for (c <- 0 to p) {
      val piv = (c to p).maxBy(r => math.abs(a(r)(c)))
      val t = a(c); a(c) = a(piv); a(piv) = t
      require(math.abs(a(c)(c)) > 1e-14, s"singular Hessian at col $c")
      for (r <- 0 to p if r != c) {
        val f = a(r)(c) / a(c)(c)
        for (k <- c to p + 1) a(r)(k) -= f * a(c)(k)
      }
    }
    (0 to p).map(i => a(i)(p + 1) / a(i)(i)).toArray
  }
}

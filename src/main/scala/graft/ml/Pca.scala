package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed PCA, top principal component by power iteration — the
  * embedding-space diagnostic (dominant drift direction, whitening
  * axis, ABBA-style dedup projection) that usually hides inside an ML
  * library. Here it is a first-class, ORACLE-CHECKABLE operator.
  *
  * 100 TB shape: the data-sized work is ONE pass — the exact Gram
  * accumulation `(i, j) → Σ xᵢxⱼ` through a map-side-combined
  * aggregate (N·d² exploded products collapse to d² groups early).
  * Everything after runs on d² + d integers: MODEL-sized, not
  * data-sized, so the driver-side power iteration is the same
  * legitimate collect as IVF's centroid table. No iteration touches
  * the corpus again.
  *
  * Exactness contract (what makes it oracle-checkable): components
  * quantize to integer milli-units; the scaled covariance
  * `C = n·S − s·sᵀ` is exact BIGINT (n² × biased covariance — the
  * scale cancels in the eigenvector); C and every iterate re-quantize
  * to ≤10⁶ via `round(x / max|x| · 10⁶)` so all matvec sums stay
  * overflow-free BIGINTs; the only float ops are per-element
  * divide-and-round with a pinned operand order and `sqrt` — never an
  * engine-accumulated float sum. Ties round half away from zero in
  * both engines. Overflow bounds (worst case): |component| ≤ 2.1 →
  * milli ≤ 2100, S ≤ N·2100², C ≤ 2·N²·2100² needs N ≤ 10⁶ rows per
  * exact BIGINT at milli scale — above that, drop to centi-units.
  */
object Pca {

  val Iters = 8
  val MilliScale = 1000.0
  val QuantScale = 1000000.0

  /** round-half-away-from-zero — matches Spark's `round()` (BigDecimal
    * HALF_UP) and DuckDB's `round()`; `math.round` would differ on
    * negative ties (-2.5 → -2 instead of -3). */
  private def halfAway(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  private def requant(xs: Array[Long]): Array[Long] = {
    val m = xs.map(math.abs).max
    xs.map(x => halfAway(x.toDouble / m.toDouble * QuantScale))
  }

  /** Top principal component of `vecCol` (array<float/double>):
    * returns d rows `(idx, loading, eigenvalue)` — the unit-norm
    * eigenvector and the biased-covariance eigenvalue (variance along
    * the component), both 6dp. Deterministic: fixed all-ones start,
    * fixed `Iters` matvecs, integer arithmetic throughout. */
  def topComponent(spark: SparkSession, df: DataFrame, vecCol: Column): DataFrame = {
    // one data-sized pass: exact milli-unit Gram matrix + column sums
    // the milli cast is guarded (null, never ANSI-throw) for the same
    // reason as Sq.micronize: InferFiltersFromGenerate + codegen subexpr
    // elimination can evaluate it before the finiteVec filter conjunct
    val m = df.filter(graft.similarity.Similarity.finiteVec(vecCol)).select(
      transform(vecCol, x => {
        val d = x.cast("double")
        when(abs(d) < 9.0e15, round(d * lit(MilliScale), 0).cast("long"))
      }).as("m"))
    val ex = m.select(col("m"), posexplode(col("m")).as(Seq("i", "xi")))
    val gram = ex
      .select(col("i"), col("xi"), posexplode(col("m")).as(Seq("j", "xj")))
      .groupBy("i", "j").agg(sum(col("xi") * col("xj")).as("sp"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val colSums = ex.groupBy("i").agg(sum("xi").as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val n = m.count()
    val d = colSums.keys.max + 1

    // model-sized driver math from here on (d² integers)
    val cRaw = Array.tabulate(d, d)((i, j) => n * gram((i, j)) - colSums(i) * colSums(j))
    val mx = cRaw.flatten.map(math.abs).max
    val c = cRaw.map(row => row.map(x => halfAway(x.toDouble / mx.toDouble * QuantScale)))

    def matvec(v: Array[Long]): Array[Long] =
      Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)

    var v = Array.fill(d)(QuantScale.toLong)
    for (_ <- 1 to Iters) v = requant(matvec(v))

    // Rayleigh quotient from one extra (re-quantized) matvec
    val s9 = matvec(v)
    val m9 = s9.map(math.abs).max
    val sh = requant(s9)
    val vs = (0 until d).map(i => v(i) * sh(i)).sum
    val vv = (0 until d).map(i => v(i) * v(i)).sum
    val eig = vs.toDouble / vv.toDouble * m9.toDouble / QuantScale *
      mx.toDouble / QuantScale / n.toDouble / n.toDouble / (MilliScale * MilliScale)
    val unit = math.sqrt(vv.toDouble)

    val rows = (0 until d).map { i =>
      Row(i, BigDecimal(v(i).toDouble / unit).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(eig).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("idx", IntegerType, nullable = false),
        StructField("loading", DoubleType, nullable = false),
        StructField("eigenvalue", DoubleType, nullable = false))))
  }
}

package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY §7.3's
  * "custom Expression" tier, preference order (b)).
  *
  * The `zip_with` + `aggregate` formulation of a dot product allocates
  * an intermediate array and walks a lambda interpreter per element;
  * these expressions compile to a single fused primitive loop inside
  * whole-stage codegen — no allocation, no virtual calls. Semantics are
  * kept bit-identical to the HOF version (sequential left-to-right
  * double accumulation) so oracle hashes don't move.
  *
  * Null handling: a null array yields null (standard BinaryExpression
  * null-safety); null *elements* contribute 0, arrays of different
  * lengths pair up to the shorter length.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  protected def getter(v: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
}

/** dot(a, b) = Σ aᵢ·bᵢ — one fused loop, codegen'd. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (fa, fb) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += get(a, i, fa) * get(b, i, fb)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ${getter(a, i, elemIsFloat(left))} * ${getter(b, i, elemIsFloat(right))};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²) — ONE pass accumulating all
  * three sums (the composed dot/norm form would walk the arrays three
  * times). Accumulation order matches the sequential HOF/oracle form. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val (fa, fb) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = get(a, i, fa); val y = get(b, i, fb)
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $x = ${getter(a, i, elemIsFloat(left))};
         |    double $y = ${getter(b, i, elemIsFloat(right))};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** IVF cell assignment — argmax over cells of (2·v·cᵢ − ‖cᵢ‖²), ties
  * to the LOWER cell id (strict-improvement scan over ascending
  * cells) — as ONE compiled loop over a driver-held centroid matrix.
  *
  * This is the training/assignment hot path: the HOF formulation
  * (aggregate over sequence(0, nlist−1) of a vector_dot each) walks a
  * lambda interpreter per cell per row — at nlist = 4·√n that is
  * hundreds of interpreted closures per row per Lloyd round. Here the
  * matrix rides the task closure like a broadcast model
  * (`addReferenceObj`), and both eval paths accumulate left-to-right
  * doubles exactly like [[DotProduct]], so the assignment — and every
  * oracle hash built on it (q78/q105/q153/q163) — is bit-identical to
  * the HOF form. */
case class NearestCell(child: Expression, centroids: Array[Array[Double]],
                       norms: Array[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centroids.nonEmpty && centroids.length == norms.length,
    "NearestCell needs one norm per centroid")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.sql}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    var best = -1
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val n = math.min(a.numElements(), cv.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i))
          dot += (if (isF) a.getFloat(i).toDouble else a.getDouble(i)) * cv(i)
        i += 1
      }
      val s = dot * 2.0 - norms(c)
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmat = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nrm = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val best = ctx.freshName("best"); val bestS = ctx.freshName("bestS")
      val c = ctx.freshName("c"); val cv = ctx.freshName("cv")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val s = ctx.freshName("s")
      val get = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $best = -1;
         |double $bestS = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $cmat.length; $c++) {
         |  double[] $cv = $cmat[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $cv.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) { $dot += $get * $cv[$i]; }
         |  }
         |  double $s = $dot * 2.0 - $nrm[$c];
         |  if ($s > $bestS) { $bestS = $s; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column wrappers + SQL registration. */
object VectorExpressions {
  def vector_dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def nearest_cell(vec: Column, centroids: Array[Array[Double]],
                   norms: Array[Double]): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(vec), centroids, norms))

  /** Expose as SQL functions (`SELECT vector_dot(a, b) …`). */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
  }
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd hot-path expressions for product quantization
  * ([[graft.similarity.Pq]]) — same reasoning as [[NearestCell]]: the
  * HOF formulation of the per-subspace argmin walks a lambda
  * interpreter per (sub × code × dim) per row (~10⁴ interpreted node
  * evals/row — measured ~40 ms/row, which made a 2 000-row encode an
  * 80-second stage), and as a CodegenFallback it knocks the whole
  * projection out of whole-stage codegen. These compile to fused
  * primitive loops; the codebook rides the task closure via
  * `addReferenceObj` like a broadcast model.
  *
  * Semantics are bit-identical to the HOF form (exact BIGINT
  * arithmetic; argmin key d·ksub + code ⇒ ties to the lower code), so
  * the q172 oracle hashes don't move. Null arrays yield null; null
  * elements read as 0 (they cannot occur after micronize).
  */
case class PqCodes(child: Expression, cents: Array[Array[Array[Long]]])
  extends UnaryExpression {
  require(cents.nonEmpty && cents.forall(_.nonEmpty),
    "PqCodes needs a non-empty codebook")

  private val m = cents.length
  private val ksub = cents(0).length
  private val sd = cents(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> (micronized vector), got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestKey = Long.MaxValue
      var c = 0
      while (c < ksub) {
        val cv = cents(s)(c)
        var d = 0L
        var j = 0
        while (j < sd) {
          val idx = s * sd + j
          val x = (if (idx < a.numElements() && !a.isNullAt(idx))
            a.getLong(idx) else 0L) - cv(j)
          d += x * x
          j += 1
        }
        val key = d * ksub + c
        if (key < bestKey) bestKey = key
        c += 1
      }
      out(s) = (bestKey % ksub).toInt
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCents", cents, "long[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out"); val s = ctx.freshName("s")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val x = ctx.freshName("x")
      val idx = ctx.freshName("idx"); val key = ctx.freshName("key")
      val bestKey = ctx.freshName("bestKey"); val cv = ctx.freshName("cv")
      s"""
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  long $bestKey = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    long[] $cv = $cb[$s][$c];
         |    long $d = 0L;
         |    for (int $j = 0; $j < $sd; $j++) {
         |      int $idx = $s * $sd + $j;
         |      long $x = ($idx < $a.numElements() && !$a.isNullAt($idx)
         |        ? $a.getLong($idx) : 0L) - $cv[$j];
         |      $d += $x * $x;
         |    }
         |    long $key = $d * $ksub + $c;
         |    if ($key < $bestKey) { $bestKey = $key; }
         |  }
         |  $out[$s] = (int) ($bestKey % $ksub);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC distance: Σ over subspaces of `lut[s][codes[s]]` — the m-lookup
  * inner loop of a PQ scan, fused. `left` = codes (array<int>),
  * `right` = the per-query LUT (array<array<bigint>>). Exact BIGINT
  * sum, identical to the HOF fold it replaces. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<array<bigint>>), " +
          s"got ${l.sql} and ${r.sql}")
    }

  override protected def nullSafeEval(cv: Any, lv: Any): Any = {
    val codes = cv.asInstanceOf[ArrayData]
    val lut = lv.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), lut.numElements())
    var acc = 0L
    var s = 0
    while (s < n) {
      val sub = lut.getArray(s)
      val c = codes.getInt(s)
      if (c >= 0 && c < sub.numElements()) acc += sub.getLong(c)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val acc = ctx.freshName("acc"); val sub = ctx.freshName("sub")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($codes.numElements(), $lut.numElements());
         |long $acc = 0L;
         |for (int $s = 0; $s < $n; $s++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $sub = $lut.getArray($s);
         |  int $c = $codes.getInt($s);
         |  if ($c >= 0 && $c < $sub.numElements()) { $acc += $sub.getLong($c); }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqExpressions {
  def pq_codes(mv: Column, cents: Array[Array[Array[Long]]]): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(mv), cents))

  def pq_adc(codes: Column, lut: Column): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(codes), ColumnBridge.expression(lut)))
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd hot path for the sign-bit quantizer
  * ([[graft.similarity.BinaryQ]]) — same reasoning as [[PqCodes]] /
  * [[PqAdc]]: the HOF formulation (`transform` over `aggregate` over
  * `sequence` for pack, `zip_with`+`aggregate` for Hamming, an indexed
  * `aggregate` for the asymmetric fold) walks a lambda interpreter per
  * element per row and falls out of whole-stage codegen; at 64 dims
  * that cost q207 a measured 4.8× (0.95 s → 4.58 s at sf0.1). These
  * compile to fused primitive loops over the array words.
  *
  * Semantics are bit-identical to the HOF forms they replace (the
  * q207/q215/q218 oracle hashes must not move):
  *
  *  - pack: bit d of word w = element(32·w+d) > 0, positions past the
  *    vector's end and null elements contribute 0; empty in → empty
  *    out; null in → null. Words hold 32 bits in a BIGINT so every
  *    downstream add stays exact under ANSI arithmetic.
  *  - hamming: Σ popcount(a[w] XOR b[w]) over the common word count
  *    (code pairs always agree on length by construction).
  *  - asym ADC: −Σ_d q_d·(2·bit_d−1) with bit d read from word d»5 at
  *    position d∧31; null if the code is too short for the query's
  *    dimensionality or a query element is null (both match the HOF's
  *    null propagation; neither occurs after micronize).
  */
case class BitPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bit_pack"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> (micronized vector), got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val words = (n + 31) / 32
    val out = new Array[Long](words)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && a.getLong(i) > 0L) out(i >> 5) |= 1L << (i & 31)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[($n + 31) / 32];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $a.getLong($i) > 0L) {
         |    $out[$i >> 5] |= 1L << ($i & 31);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance of two packed codes: Σ popcount(XOR), exact
  * BIGINT. Null semantics match the HOF form this replaced
  * (`aggregate(zip_with(a, b, bit_count ∘ xor), sum)`): codes of
  * DIFFERENT word counts return null (zip_with pads the short side
  * with null → the sum is null), and a null word slot returns null —
  * never a silently-wrong number over min-length/garbage reads. On
  * the [[BitPack]] happy path codes always agree on length and carry
  * containsNull=false, so the per-slot check compiles away and the
  * hot loop is the same fused popcount-XOR as before. */
case class HammingDist(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_dist"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> codes, got ${l.sql} and ${r.sql}")
    }

  // static: do the inputs even admit null slots? BitPack emits
  // containsNull=false, so the usual case skips per-slot checks both
  // interpreted and in the generated loop.
  private def slotsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override protected def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var w = 0
    while (w < n) {
      if (slotsNullable && (a.isNullAt(w) || b.isNullAt(w))) return null
      acc += java.lang.Long.bitCount(a.getLong(w) ^ b.getLong(w))
      w += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val w = ctx.freshName("w")
      val acc = ctx.freshName("acc")
      val slotCheck = if (slotsNullable)
        s"if ($a.isNullAt($w) || $b.isNullAt($w)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $w = 0; $w < $n; $w++) {
         |    $slotCheck
         |    $acc += java.lang.Long.bitCount($a.getLong($w) ^ $b.getLong($w));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Asymmetric sign-bit ADC: −Σ_d qmv[d]·(2·bit_d−1), bit d = bit d∧31
  * of code word d»5. `left` = the packed corpus code (array<bigint>),
  * `right` = the full-precision micronized query (array<bigint>).
  * Null if the code has fewer than ⌈len(q)/32⌉ words or a query
  * element is null — the HOF fold's null propagation, kept so the
  * native form is a drop-in even off the happy path. */
case class BinaryAsymAdc(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "binary_asym_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint> code, array<bigint> query), " +
          s"got ${l.sql} and ${r.sql}")
    }

  override protected def nullSafeEval(cv: Any, qv: Any): Any = {
    val code = cv.asInstanceOf[ArrayData]
    val q = qv.asInstanceOf[ArrayData]
    val n = q.numElements()
    if ((n + 31) / 32 > code.numElements()) return null
    var acc = 0L
    var d = 0
    while (d < n) {
      if (q.isNullAt(d)) return null
      val bit = (code.getLong(d >> 5) >>> (d & 31)) & 1L
      acc += q.getLong(d) * (2L * bit - 1L)
      d += 1
    }
    -acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, q) => {
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val acc = ctx.freshName("acc"); val bit = ctx.freshName("bit")
      s"""
         |int $n = $q.numElements();
         |if (($n + 31) / 32 > $code.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $d = 0; $d < $n; $d++) {
         |    if ($q.isNullAt($d)) { ${ev.isNull} = true; break; }
         |    long $bit = ($code.getLong($d >> 5) >>> ($d & 31)) & 1L;
         |    $acc += $q.getLong($d) * (2L * $bit - 1L);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = -$acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BinaryQExpressions {
  def bit_pack(mv: Column): Column =
    ColumnBridge.column(BitPack(ColumnBridge.expression(mv)))

  def hamming_dist(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def binary_asym_adc(code: Column, qmv: Column): Column =
    ColumnBridge.column(BinaryAsymAdc(
      ColumnBridge.expression(code), ColumnBridge.expression(qmv)))
}

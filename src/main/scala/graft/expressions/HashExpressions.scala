package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native signature expressions for the dedup hot path.
  *
  * The column-algebra forms build one fold/lambda tree per hash
  * function (64 `transform`+`array_min` trees for a 64-hash MinHash
  * signature) — large plans, interpreted lambdas, and an array walk per
  * hash. These fuse everything into one primitive loop per row and are
  * bit-compatible with the algebra forms (same mix constants, same
  * update rules — asserted in DedupSpec).
  */

/** MinHash signature: for each j, min over elements of
  * ((a_j·h32 + b_j) mod 2^32), input = array<long> of 32-bit hashes.
  * Empty arrays yield the max value 2^32−1 per slot (no shingles →
  * degenerate signature, same as array_min of empty → null guarded
  * upstream by greatest(size,0) sequence semantics). */
case class MinHashSignature(child: Expression, a: Array[Long], b: Array[Long])
  extends UnaryExpression {

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  private val k = a.length
  private val Mask = 0xffffffffL

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill[Long](k)(Mask)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val cand = (a(j) * h + b(j)) & Mask
        if (cand < mins(j)) mins(j) = cand
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val mins = ctx.freshName("mins")
      val h = ctx.freshName("h"); val cand = ctx.freshName("cand")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[${k}];
         |java.util.Arrays.fill($mins, ${Mask}L);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < ${k}; $j++) {
         |    long $cand = ($aRef[$j] * $h + $bRef[$j]) & ${Mask}L;
         |    if ($cand < $mins[$j]) $mins[$j] = $cand;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash from an array<long> of token hashes: per bit,
  * sign of Σ(±1) votes. One loop, int[64] votes. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 64) {
        votes(j) += (((h >>> j) & 1L).toInt * 2) - 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val votes = ctx.freshName("votes")
      val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $c.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $votes[$j] += (int) (((($h >>> $j) & 1L) * 2) - 1);
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HashExpressions {
  def minhash_signature(h32: Column, a: Array[Long], b: Array[Long]): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(h32), a, b))

  def simhash64(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokenHashes)))
}

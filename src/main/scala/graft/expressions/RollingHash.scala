package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Rabin–Karp rolling window hash over an array of per-token hashes:
  * output[i] = Σ_{j<L} B^(L-1-j) · h[i+j] in Z/2^64 (Java wrap-around),
  * maintained incrementally — H_{i+1} = (H_i − B^{L-1}·h[i])·B + h[i+L]
  * — so the whole window-hash column is O(n) per document instead of
  * the O(n·L) string-build-and-md5 of the oracle-checkable path
  * ([[graft.text.SpanDedup.windows]]). Arrays shorter than L yield an
  * empty result. SpanDedupSpec pins that the fast path finds the SAME
  * duplicated positions as the md5 path on real corpora.
  */
case class RollingTokenHash(child: Expression, windowLen: Int)
  extends UnaryExpression {

  require(windowLen >= 1, "window length must be >= 1")

  override def prettyName: String = "rolling_token_hash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  /** FNV-64 prime: odd, so multiplication is a bijection mod 2^64 and
    * windows differing in any token hash differently with the usual
    * polynomial-hash collision bounds. */
  private val B = 0x100000001b3L

  /** B^(L-1) mod 2^64, for the subtract-leading-term update. */
  private val bPow: Long = {
    var p = 1L
    var i = 1
    while (i < windowLen) { p *= B; i += 1 }
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < windowLen) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - windowLen + 1)
    var h = 0L
    var i = 0
    while (i < windowLen) { h = h * B + arr.getLong(i); i += 1 }
    out(0) = h
    while (i < n) {
      h = (h - bPow * arr.getLong(i - windowLen)) * B + arr.getLong(i)
      out(i - windowLen + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int $n = $c.numElements();
         |long[] $out = ($n < $windowLen) ? new long[0]
         |    : new long[$n - $windowLen + 1];
         |if ($n >= $windowLen) {
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $windowLen; $i++) { $h = $h * ${B}L + $c.getLong($i); }
         |  $out[0] = $h;
         |  for (; $i < $n; $i++) {
         |    $h = ($h - ${bPow}L * $c.getLong($i - $windowLen)) * ${B}L
         |        + $c.getLong($i);
         |    $out[$i - $windowLen + 1] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RollingHash {
  def rolling_token_hash(tokenHashes: Column, windowLen: Int): Column =
    ColumnBridge.column(
      RollingTokenHash(ColumnBridge.expression(tokenHashes), windowLen))
}

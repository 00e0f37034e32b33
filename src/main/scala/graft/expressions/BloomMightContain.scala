package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] sketch
  * (spark-sketch public API) — the row-level runtime-filter primitive:
  * build the sketch on the small join side, probe it in the fact scan's
  * filter, and most non-matching rows die before the shuffle. No false
  * negatives, so `bloom(k) && join` ≡ `join`.
  *
  * A custom expression (not a UDF) so the probe inlines into
  * whole-stage codegen via the reference mechanism.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
  extends UnaryExpression {

  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName supports integral or string keys, got ${other.sql}")
  }

  // def, not val: the child is unresolved at construction time
  private def isString = child.dataType == StringType

  override protected def nullSafeEval(input: Any): Any =
    if (isString)
      filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
    else
      filter.mightContainLong(input match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case s: java.lang.Short => s.longValue()
        case b: java.lang.Byte => b.longValue()
        case other => other.asInstanceOf[Long]
      })

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => {
      if (isString)
        s"${ev.value} = $ref.mightContainBinary($c.getBytes());"
      else
        s"${ev.value} = $ref.mightContainLong((long) $c);"
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BloomMightContain {
  def apply(key: Column, filter: BloomFilter): Column =
    ColumnBridge.column(new BloomMightContain(ColumnBridge.expression(key), filter))
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of tokens present in a fixed dictionary (occurrences, not
  * distinct) — the stopword-ratio / language-profile scoring primitive.
  *
  * The column-algebra form `size(filter(toks, t => array_contains(dict,
  * lower(t))))` runs an interpreted lambda per token with an O(|dict|)
  * scan; this fuses to one loop with an O(1) hash-set probe and inline
  * ASCII lowercasing.
  */
case class TokenSetCount(child: Expression, dict: Set[String], lowercase: Boolean)
  extends UnaryExpression {

  override def prettyName: String = "token_set_count"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  // UTF8String set shared across rows (built once per task via the
  // codegen reference mechanism / lazily for interpreted eval)
  @transient private lazy val utf8Dict: java.util.HashSet[UTF8String] = buildDict

  private def buildDict: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](dict.size * 2)
    dict.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val probe = if (lowercase) t.toLowerCase else t
        if (utf8Dict.contains(probe)) cnt += 1
      }
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dictRef = ctx.addReferenceObj("tokenDict", buildDict,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt"); val t = ctx.freshName("t")
      val lower = if (lowercase) s"$t = $t.toLowerCase();" else ""
      s"""
         |int $n = $c.numElements();
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $t = $c.getUTF8String($i);
         |    $lower
         |    if ($dictRef.contains($t)) $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokenSetCount {
  def apply(tokens: Column, dict: Set[String], lowercase: Boolean): Column =
    ColumnBridge.column(
      new TokenSetCount(ColumnBridge.expression(tokens), dict, lowercase))
}

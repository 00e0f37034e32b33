package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen'd
  * expression — the canonicalization step a multilingual corpus needs
  * before ANY hash-keyed operator (exact dedup, MinHash shingles, line
  * dedup): "café" composed and "café" decomposed are byte-different,
  * hash-different strings that render identically, so un-normalized
  * corpora leak duplicates straight through fingerprint dedup.
  *
  * Spark ships no normalizer function; a Scala UDF would pay
  * serialization + break codegen fusion. This calls
  * `java.text.Normalizer` (ICU-equivalent for the standard forms)
  * inline inside whole-stage codegen.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * is true for almost every real-world string (ASCII is trivially
  * NFC); only rows that actually need recomposition pay the
  * normalize-and-copy. At 100 TB this is a pure per-row projection
  * fused into the scan — no shuffle, no UDF boundary.
  */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unsupported normalization form: $form")

  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  @transient private lazy val javaForm = Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, javaForm)) input
    else UTF8String.fromString(Normalizer.normalize(s, javaForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      s"""
         |String $str = $c.toString();
         |if (java.text.Normalizer.isNormalized($str,
         |    java.text.Normalizer.Form.$form)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($str,
         |      java.text.Normalizer.Form.$form));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnicodeNormalize {
  def nfc(col: Column): Column = apply(col, "NFC")
  def nfkc(col: Column): Column = apply(col, "NFKC")

  def apply(col: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(col), form))
}

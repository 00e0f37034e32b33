package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact intersection size of two SORTED, DISTINCT string arrays with an
  * early-exit lower bound — the verification primitive for the
  * prefix-filtered exact sim-joins (q234/q239/q211/q240 and the census
  * defaults).
  *
  * `sorted_intersect_at_least(a, b, need)` returns `|a ∩ b|` when the
  * count reaches `need`, and `-1` the moment it provably cannot: at any
  * merge position, `count_so_far + min(remaining_a, remaining_b)` is an
  * upper bound on the final count, so a pair destined to fail its
  * similarity threshold aborts after ~(1−t)·min(|a|,|b|) comparisons
  * instead of a full pass. Callers must treat `-1` as "below need" and
  * filter it out; the sentinel never escapes into results because any
  * similarity ≥ t implies count ≥ need (the caller derives `need` as a
  * conservative FLOOR of the threshold in micro-units, see
  * [[graft.dedup.Dedup.prefixFilterContainmentJoinOn]]).
  *
  * Versus `size(array_intersect(a, b))`: the built-in builds a per-call
  * hash set of one side and probes the other (allocation + hashing per
  * pair — millions of candidate pairs in the prefix joins); this is one
  * allocation-free merge over the pre-sorted arrays using UTF8String's
  * binary comparator — the SAME ordering `sort_array` applies to
  * StringType, so sorting once per document upstream replaces hashing
  * once per candidate pair.
  *
  * PRECONDITIONS (documented, not checked — the caller owns the prep):
  * both arrays sorted ascending by Spark's binary string ordering with
  * nulls FIRST (`sort_array(array_distinct(x))` produces exactly this)
  * and element-distinct. Null ELEMENT handling matches
  * `array_intersect`: a null element in BOTH arrays contributes 1.
  * A null ARRAY (or null `need`) yields null (standard ternary
  * null-safety).
  */
case class SortedIntersectAtLeast(first: Expression, second: Expression,
                                  third: Expression)
  extends TernaryExpression {

  override def prettyName: String = "sorted_intersect_at_least"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType): Boolean = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (arr(first.dataType) && arr(second.dataType) &&
        third.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, array<string>, bigint), got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")
  }

  override protected def nullSafeEval(l: Any, r: Any, n: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val need = n.asInstanceOf[Long]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    var cnt = 0L
    // nulls sort first: consume them, count 1 if present on both sides
    while (i < na && a.isNullAt(i)) i += 1
    while (j < nb && b.isNullAt(j)) j += 1
    if (i > 0 && j > 0) cnt = 1L
    while (i < na && j < nb) {
      val rem = math.min(na - i, nb - j)
      if (cnt + rem < need) return -1L
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    if (cnt >= need) cnt else -1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, n) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt"); val rem = ctx.freshName("rem")
      val c = ctx.freshName("c"); val done = ctx.freshName("done")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0;
         |long $cnt = 0L;
         |boolean $done = false;
         |while ($i < $na && $a.isNullAt($i)) $i++;
         |while ($j < $nb && $b.isNullAt($j)) $j++;
         |if ($i > 0 && $j > 0) $cnt = 1L;
         |while (!$done && $i < $na && $j < $nb) {
         |  long $rem = (long) java.lang.Math.min($na - $i, $nb - $j);
         |  if ($cnt + $rem < $n) { $cnt = -1L; $done = true; }
         |  else {
         |    int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |    if ($c == 0) { $cnt++; $i++; $j++; }
         |    else if ($c < 0) $i++;
         |    else $j++;
         |  }
         |}
         |${ev.value} = ($done || $cnt >= $n) ? $cnt : -1L;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object SortedIntersect {
  /** Column builder; see [[SortedIntersectAtLeast]] for the contract. */
  def sorted_intersect_at_least(a: Column, b: Column, need: Column): Column =
    ColumnBridge.column(SortedIntersectAtLeast(
      ColumnBridge.expression(a), ColumnBridge.expression(b),
      ColumnBridge.expression(need)))
}

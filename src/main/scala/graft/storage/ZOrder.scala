package graft.storage

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional layout trick
  * behind Delta `OPTIMIZE ZORDER BY` / Iceberg sort orders: interleave
  * the bits of two (or more) columns so that range predicates on ANY
  * of them map to contiguous-ish runs of the curve, and file-level
  * min/max statistics prune on all dimensions at once instead of only
  * the leading sort key.
  *
  * The z-value is a pure integer column expression built at plan time
  * (a Scala-level fold over bit positions — shift counts must be
  * literals, so the 2·bits terms constant-fold and stay inside
  * whole-stage codegen; no HOF, no UDF). Writing is just
  * `repartitionByRange(zCol).sortWithinPartitions(zCol)` — every
  * downstream engine reads the same parquet.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of nonneg x and y:
    * bit b of x lands at position 2b, bit b of y at 2b+1. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { b =>
      shiftright(x.cast("long"), b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(y.cast("long"), b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduceLeft(_ + _)

  /** The same arithmetic as ANSI SQL (for oracle replay). */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) * ${1L << (2 * b)} + (($y >> $b) & 1) * ${1L << (2 * b + 1)})"
    }.mkString("(", " + ", ")")
}

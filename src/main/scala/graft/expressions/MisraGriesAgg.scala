package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Misra–Gries heavy hitters: the bounded-memory frequent-items sketch
  * (the SpaceSaving/Frequent family) as a `TypedImperativeAggregate` —
  * at most `k` counters EVER, one pass, map-side partial merge.
  *
  * Guarantee: for every key with true count > N/(k+1) the sketch
  * retains the key, and each reported lower-bound count understates
  * the true count by at most N/(k+1) (N = rows scanned). Merging two
  * sketches sums counters then applies the standard k-th-largest
  * decrement, preserving the bound — so hot-key detection over 100 TB
  * is one narrow aggregate: each task ships ≤ k (key, count) pairs, no
  * shuffle of the key column's full distribution. This is the detector
  * that decides WHICH keys [[graft.operators.Operators.saltedJoin]]
  * needs to salt.
  *
  * Exact counts (when needed) come from one follow-up aggregation
  * filtered to the ≤ k surviving candidates. Output:
  * array<struct<key:bigint, lower:bigint>>, by lower-bound count
  * descending (ties: key ascending). Null keys are skipped.
  */
case class MisraGriesHitters(
    key: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(k > 0, "heavy_hitters: k must be positive")

  override def prettyName: String = "heavy_hitters"
  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("lower", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = key.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint keys, got ${t.sql}")
  }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  /** The classic step: count if tracked or space free, else decrement
    * every counter (dropping zeros) — the "cancel one of each" move
    * that caps the map at k entries. */
  private def offer(buf: mutable.LongMap[Long], x: Long, w: Long): Unit =
    buf.get(x) match {
      case Some(cur) => buf.update(x, cur + w)
      case None if buf.size < k => buf.update(x, w)
      case None =>
        // decrement ALL counters by min(w, smallest counter) and absorb
        // only the remainder of the incoming weight — each such round
        // deletes (k+1)·dec total weight, which is what bounds the
        // undercount by N/(k+1)
        val dec = math.min(w, buf.values.min)
        val entries = buf.toArray // snapshot: no mutation mid-iteration
        entries.foreach { case (kk, v) =>
          if (v - dec <= 0) buf.remove(kk) else buf.update(kk, v - dec)
        }
        if (w - dec > 0 && buf.size < k) buf.update(x, w - dec)
    }

  override def update(buf: mutable.LongMap[Long],
                      input: InternalRow): mutable.LongMap[Long] = {
    val x = key.eval(input)
    if (x != null) offer(buf, x.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: mutable.LongMap[Long],
                     other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (kk, v) => offer(buf, kk, v) }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val sorted = buf.toArray.sortBy { case (kk, v) => (-v, kk) }
    new GenericArrayData(sorted.map { case (kk, v) =>
      InternalRow(kk, v)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreachEntry { (kk, v) => out.writeLong(kk); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.update(in.readLong(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MisraGriesHitters =
    copy(key = cs(0))
}

object MisraGriesAgg {
  /** Aggregate column: ≤ k heavy-hitter candidates with lower-bound
    * counts, hottest first. */
  def heavy_hitters(key: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesHitters(ColumnBridge.expression(key), k)
        .toAggregateExpression())
}

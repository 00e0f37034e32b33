package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Per-key running statistics on Spark 4's `transformWithState` —
  * the successor API to `flatMapGroupsWithState` (which
  * [[CountryStatsStream]] still exercises): typed per-key state
  * handles (`ValueState`/`ListState`/`MapState`), explicit time modes,
  * per-state TTL, and RocksDB-backed stores with changelog
  * checkpointing.
  *
  * State here is the same mergeable (n, sum, m2) Welford triple the
  * legacy path uses, so both APIs are pinned against the identical
  * batch ground truth. 100 TB shape: state is per-key and
  * RocksDB-spillable; each micro-batch touches only the keys present
  * in it.
  */
object TwsStats {

  case class In(key: String, x: Double)
  case class Agg(n: Long, sum: Double, m2: Double)
  case class Out(key: String, n: Long, mean: Double, variance: Double)

  class Processor extends StatefulProcessor[String, In, Out] {
    @transient private var st: ValueState[Agg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Agg]("welford", Encoders.product[Agg],
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[In],
                                 tv: TimerValues): Iterator[Out] = {
      var a = if (st.exists()) st.get() else Agg(0L, 0.0, 0.0)
      rows.foreach { r =>
        val n1 = a.n + 1
        val d = r.x - (if (a.n == 0) 0.0 else a.sum / a.n)
        val mean1 = (a.sum + r.x) / n1
        val d2 = r.x - mean1
        a = Agg(n1, a.sum + r.x, a.m2 + d * d2)
      }
      st.update(a)
      Iterator(Out(key, a.n, a.sum / a.n,
        if (a.n < 2) 0.0 else a.m2 / (a.n - 1)))
    }
  }

  /** Wire the processor onto a typed stream. */
  def stream(in: Dataset[In]): Dataset[Out] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.key)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Update(), Encoders.product[Out])
  }
}

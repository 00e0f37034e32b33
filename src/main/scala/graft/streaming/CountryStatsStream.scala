package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming per-key running stats (SURVEY §2.4 A15 / §2.9 T5):
  * the reference's in-heap `stats` dict (`consumer.py:217,249-251`)
  * becomes `groupByKey.flatMapGroupsWithState` carrying a [[Welford.Buf]]
  * per key. Update-mode output emits the refreshed stats for every key
  * touched by the micro-batch — the streaming analogue of the
  * consumer's per-record printout.
  *
  * State is O(keys) tiny fixed-size buffers; no watermark is needed for
  * parity (the accumulators are order-insensitive, T6) but a processing-
  * time timeout can be configured for hygiene on unbounded key spaces.
  */
object CountryStatsStream {

  import Welford._

  def updateGroup(key: String, rows: Iterator[In],
                  state: GroupState[Buf]): Iterator[Out] = {
    val start = state.getOption.getOrElse(Buf.zero)
    val buf = rows.foldLeft(start)((b, r) => b.update(r.y, r.yPred))
    state.update(buf)
    Iterator.single(Out(key, buf.n, buf.mae.getOrElse(Double.NaN), buf.r2))
  }

  /** Wire the stateful op onto any Dataset[In] (streaming or batch). */
  def runningStats(ds: Dataset[In]): Dataset[Out] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Buf, Out](
        OutputMode.Update, GroupStateTimeout.NoTimeout)(updateGroup)
  }
}

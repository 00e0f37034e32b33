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
                  state: GroupState[Buf]): Iterator[Out] =
    updateGroupTtl(None)(key, rows, state)

  /** As [[updateGroup]], with an optional processing-time TTL: a key
    * idle longer than `ttlMs` has its state evicted (the timeout fires
    * with an empty row iterator); records arriving later start a fresh
    * accumulator — the scale-hygiene story for unbounded key spaces
    * (country codes are bounded; user/session keys are not). */
  def updateGroupTtl(ttlMs: Option[Long])(key: String, rows: Iterator[In],
                                          state: GroupState[Buf]): Iterator[Out] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val start = state.getOption.getOrElse(Buf.zero)
      val buf = rows.foldLeft(start)((b, r) => b.update(r.y, r.yPred))
      state.update(buf)
      ttlMs.foreach(state.setTimeoutDuration)
      Iterator.single(Out(key, buf.n, buf.mae.getOrElse(Double.NaN), buf.r2))
    }
  }

  /** Wire the stateful op onto any Dataset[In] (streaming or batch).
    * `ttlMs` enables processing-time state expiry (requires a streaming
    * Dataset — batch executions ignore timeouts). */
  def runningStats(ds: Dataset[In], ttlMs: Option[Long] = None): Dataset[Out] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val timeout = if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                  else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Buf, Out](
        OutputMode.Update, timeout)(updateGroupTtl(ttlMs))
  }
}

package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-key running regression stats — the reference's `CountryStats`
  * (`kafka/consumer.py:123-151`): Welford online mean/M2 for the
  * y-variance plus running Σ|err| and Σerr², yielding running MAE and
  * R² per country.
  *
  * The buffer is a commutative, mergeable monoid (Chan et al. parallel
  * Welford merge), so the same aggregator works as (a) a batch typed
  * `Aggregator` in `groupBy().agg()` — map-side combinable, one shuffle
  * of O(keys) buffers — and (b) streaming state inside
  * `flatMapGroupsWithState` (see [[CountryStatsStream]]). Spark's own
  * stddev/var use the identical update rule (CentralMomentAgg).
  */
object Welford {

  /** (n, mean, m2) running moments + (ssRes, sumAbs) error sums. */
  final case class Buf(n: Long, mean: Double, m2: Double,
                       ssRes: Double, sumAbs: Double) {
    def update(y: Double, yPred: Double): Buf = {
      val n1 = n + 1
      val delta = y - mean
      val mean1 = mean + delta / n1
      val m21 = m2 + delta * (y - mean1)
      val err = y - yPred
      Buf(n1, mean1, m21, ssRes + err * err, sumAbs + math.abs(err))
    }
    /** Chan et al. pairwise merge — associative + commutative. */
    def merge(o: Buf): Buf =
      if (n == 0) o
      else if (o.n == 0) this
      else {
        val nT = n + o.n
        val delta = o.mean - mean
        Buf(nT,
          mean + delta * o.n / nT,
          m2 + o.m2 + delta * delta * n * o.n / nT,
          ssRes + o.ssRes, sumAbs + o.sumAbs)
      }
    def mae: Option[Double] = if (n > 0) Some(sumAbs / n) else None
    /** r2 = 1 − ssRes/ssTot; None until variance exists (consumer.py:143-146). */
    def r2: Option[Double] = if (n >= 2 && m2 > 0) Some(1.0 - ssRes / m2) else None
  }
  object Buf { val zero: Buf = Buf(0L, 0.0, 0.0, 0.0, 0.0) }

  final case class In(key: String, y: Double, yPred: Double)
  final case class Out(key: String, n: Long, mae: Double, r2: Option[Double])

  /** Typed aggregator for batch/streaming `groupBy(...).agg(...)`. */
  class StatsAggregator extends Aggregator[In, Buf, Out] {
    override def zero: Buf = Buf.zero
    override def reduce(b: Buf, a: In): Buf = b.update(a.y, a.yPred)
    override def merge(b1: Buf, b2: Buf): Buf = b1.merge(b2)
    override def finish(b: Buf): Out = Out("", b.n, b.mae.getOrElse(Double.NaN), b.r2)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }
}

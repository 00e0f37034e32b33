package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whole-operator building blocks Spark lacks as single calls, each
  * composed from built-ins per the preference order (SURVEY §7.3 /
  * builder mandate (a): compose existing ops when semantics allow —
  * these all reduce to ONE shuffle, which a custom SparkPlan could not
  * beat).
  */
object Operators {

  /** As-of (point-in-time) join: for every left row, the latest right
    * row with `right.time <= left.time` on the same key — the temporal
    * join behind feature stores and leakage-free training joins.
    *
    * Plan shape: tag + unionByName + ONE window over (key, time) with
    * `last(payload, ignoreNulls)` carry-forward, then keep left rows.
    * Cost = one shuffle on the key (the union is shuffle-free), versus
    * the naive range-join which explodes to O(|L|·|R|) per key.
    * `toleranceSeconds` nulls out matches older than the horizon.
    *
    * Right payload columns are emitted under their own names and must
    * not clash with left columns; ties at equal time prefer the right
    * row (inclusive <=).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               timeCol: String, rightValueCols: Seq[String],
               toleranceSeconds: Option[Long] = None): DataFrame = {
    val payload = struct(
      (rightValueCols.map(col) :+ col(timeCol).as("__rt")): _*)
    val rTagged = right
      .filter(col(timeCol).isNotNull)
      .select((keyCols.map(col) :+ col(timeCol) :+ payload.as("__rpayload")): _*)
      .withColumn("__is_left", lit(0))
    val lTagged = left.withColumn("__is_left", lit(1))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort before left rows at equal timestamps → inclusive
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", last(col("__rpayload"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
    val horizonOk = toleranceSeconds match {
      case Some(t) =>
        unix_timestamp(col(timeCol)) - unix_timestamp(col("__match.__rt")) <= t
      case None => lit(true)
    }
    val matched = carried.withColumn("__ok",
      col("__match").isNotNull && horizonOk)
    val out = rightValueCols.foldLeft(matched) { (d, c) =>
      d.withColumn(c, when(col("__ok"), col(s"__match.$c")))
    }.withColumn("__asof_time", when(col("__ok"), col("__match.__rt")))
    out.drop("__is_left", "__rpayload", "__match", "__ok")
  }

  /** Salted equi-join for skewed keys: the big side gets a deterministic
    * salt in [0, salts); the (smaller) build side is exploded `salts`
    * times so every salted key finds its match. Turns one hot reducer
    * into `salts` even ones at the cost of replicating the build side —
    * the standard fix when AQE skew-join can't help (e.g. a hot key
    * inside a single aggregation/join stage at 100 TB).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val explodedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(explodedSmall, keyCols :+ "__salt", joinType).drop("__salt")
  }

  /** One-pass key-skew census over a prospective join key: (n_rows,
    * n_keys, max_rows, imbalance = max/avg rows per key) — the q158
    * audit reduced to the four numbers the join planner needs. One
    * map-side-combined groupBy; the second aggregate is
    * key-cardinality-sized. */
  def keySkewStats(df: DataFrame, keyCols: Seq[String]): (Long, Long, Long, Double) = {
    val r = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(sum("__c").as("n"), count(lit(1)).as("k"), max("__c").as("m"))
      .head()
    val (n, k, m) = (r.getLong(0), r.getLong(1), r.getLong(2))
    (n, k, m, if (n == 0) 1.0 else m.toDouble * k / n)
  }

  /** Join-strategy decision derived from the skew census: salt when the
    * hottest key exceeds `imbalanceThreshold`× the average key load,
    * with the salt factor = ⌈imbalance⌉ clamped to [2, maxSalts] — just
    * enough splits to flatten the hot reducer back to ~average load,
    * no more build-side replication than that. Returns
    * (salted?, salts, measured imbalance). */
  def skewJoinDecision(big: DataFrame, keyCols: Seq[String],
                      imbalanceThreshold: Double = 4.0,
                      maxSalts: Int = 64): (Boolean, Int, Double) = {
    val (_, _, _, imb) = keySkewStats(big, keyCols)
    if (imb > imbalanceThreshold)
      (true, math.max(2L, math.min(maxSalts.toLong, math.ceil(imb).toLong)).toInt, imb)
    else (false, 1, imb)
  }

  /** Skew-aware equi-join: q158's census wired into the strategy
    * choice — measures the big side's key imbalance and picks plain
    * shuffle join (uniform keys) or [[saltedJoin]] with a derived salt
    * factor (skewed keys) automatically. Result ≡ the plain join
    * either way; only the shuffle shape differs.
    *
    * The census is one eager aggregate pass over the big side —
    * at 100 TB, feed `decision` from stored table statistics or a
    * cached q158 census instead of remeasuring per join. */
  def skewAwareJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
                    joinType: String = "inner",
                    imbalanceThreshold: Double = 4.0,
                    maxSalts: Int = 64,
                    decision: Option[(Boolean, Int, Double)] = None): DataFrame = {
    val (salted, salts, imb) =
      decision.getOrElse(skewJoinDecision(big, keyCols, imbalanceThreshold, maxSalts))
    if (salted) {
      log.info(f"skewAwareJoin: imbalance $imb%.1f > $imbalanceThreshold%.1f " +
        s"on ${keyCols.mkString(",")} — salting with $salts salts")
      saltedJoin(big, small, keyCols, salts, joinType)
    } else big.join(small, keyCols, joinType)
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Bloom-prefiltered join: build a bloom sketch of the (small) build
    * side's keys, probe it in the fact side's scan filter, then join.
    * No false negatives → identical results to the plain join; most
    * non-matching fact rows are dropped BEFORE the shuffle, which is
    * the point at 100 TB when the dim side is selective. `expectedItems`
    * sizes the sketch (driver-held, broadcast with the task closure).
    */
  def bloomPrefilterJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                         dimKey: String, expectedItems: Long = 1000000L,
                         fpp: Double = 0.03, joinType: String = "inner"): DataFrame = {
    val sketch = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val pruned = fact.filter(
      graft.expressions.BloomMightContain(col(factKey), sketch))
    pruned.join(dim, pruned(factKey) === dim(dimKey), joinType)
  }

  /** Distributed exact running total: adds `__run` = inclusive running
    * sum of `valueCol` over the global `orderCols` order, with no
    * single-partition window. Deterministic range buckets come from
    * `approxQuantile` boundaries on the leading order key (a pure
    * function of the data — unlike repartitionByRange's per-job
    * sampling), per-bucket windows run in parallel, and a tiny
    * collected offset table broadcasts back. Three linear scans, every
    * stage parallel. The leading order key must be numeric-castable;
    * ties on it stay in one bucket and are ordered by the full
    * `orderCols` within the window. Shared by sequence packing and
    * weighted systematic sampling.
    */
  def withRunningTotal(df: DataFrame, valueCol: Column,
                       orderCols: Seq[Column], buckets: Int = 32): DataFrame = {
    val keyed = df.withColumn("__ord", orderCols.head.cast("double"))
      .withColumn("__val", valueCol)
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds = keyed.stat.approxQuantile("__ord", probes, 0.001)
      .distinct.sorted
    val bucketCol =
      if (bounds.isEmpty) lit(0)
      else bounds.map(b => when(col("__ord") >= b, 1).otherwise(0)).reduce(_ + _)
    val bucketed = keyed.withColumn("__bkt", bucketCol)
    // a bucket whose values are ALL null sums to null — treat it as 0,
    // matching the window sum below (which skips nulls), so null-valued
    // rows contribute nothing instead of NPE-ing the offset table
    val totals = bucketed.groupBy("__bkt").agg(sum("__val").as("__t"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toDF("__bkt", "__off")
    val w = Window.partitionBy(col("__bkt")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsetDf), Seq("__bkt"))
      .withColumn("__run", sum(col("__val")).over(w) + col("__off"))
      .drop("__bkt", "__ord", "__off")
  }

  /** Write a table bucketed (and sorted) on the join key: later joins
    * and aggregations on `bucketCols` read co-located buckets and skip
    * the shuffle entirely — the 100 TB answer for repeatedly-joined
    * fact tables. (Bucket metadata lives in the session catalog, so
    * this writes through `saveAsTable`.)
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
}

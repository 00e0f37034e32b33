package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational operator inventory (SURVEY.md §2.1–2.7) expressed over the
  * star-schema testdata, each with a DuckDB oracle.
  *
  * Determinism rules for the oracle hash-match (SURVEY.md §7.4.7):
  *  - every query ends in a total ORDER BY (full key, explicit null order);
  *  - money sums go through DECIMAL(18,2) (exact) and are cast back to
  *    DOUBLE at the end — bit-identical across Spark and DuckDB;
  *  - non-exact double aggregates (corr, stddev, quantile interpolation)
  *    are round()ed to 6 dp on both sides;
  *  - timestamps are emitted as formatted strings, never raw timestamps.
  */
object Relational {

  /** Exact decimal view of a 2-dp money column. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q01
  // S1/P2/P13: parquet scan + filter + projection. Filter and the
  // 3-column projection must reach the scan (PushedFilters/ReadSchema).
  val q01_scan_filter: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      // l_quantity in the sort: (orderkey, linenumber) is not unique in
      // the synthetic data, and a tied output order is engine-dependent
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")

  val q01_sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity
      |FROM lineitem WHERE l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin

  // ---------------------------------------------------------------- q02
  // P4/F8: coerce-to-null cast (the reference's to_numeric(errors="coerce"),
  // src/etl.py:90-92) — parse the numeric payload out of a JSON-ish string.
  val q02_cast_coerce: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .select(
        col("event_id"),
        regexp_replace(col("props"), "[^0-9]", "").cast("int").as("k"),
        // Spark 4 runs ANSI mode: plain cast throws on malformed input,
        // try_cast gives the reference's coerce-to-null semantics (P4).
        expr("try_cast(event_type AS DOUBLE)").as("bad_cast"))
      .orderBy("event_id")

  val q02_sql: String =
    """SELECT event_id,
      |  CAST(regexp_replace(props, '[^0-9]', '', 'g') AS INTEGER) AS k,
      |  TRY_CAST(event_type AS DOUBLE) AS bad_cast
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q03
  // A1/A2: global aggregates — count, exact decimal sum, min/max, mean.
  val q03_agg_global: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    li.agg(
      count(lit(1)).as("n"),
      sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"),
      (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"))
  }

  val q03_sql: String =
    """SELECT count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  min(l_extendedprice) AS min_price,
      |  max(l_extendedprice) AS max_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- q04
  // A5: grouped aggregation, TPC-H Q1 shape. Partial aggregation
  // (map-side combine) + 2-key shuffle; at 100 TB this is the canonical
  // low-cardinality groupBy — shuffle volume is O(groups), not O(rows).
  val q04_group_agg: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    val discPrice = dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(8, 2)) - dec(col("l_discount")))
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        count(lit(1)).as("n"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q04_sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS n,
      |  sum(l_quantity) / count(*) AS avg_qty
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q05
  // Star join: orders ⋈ customer ⋈ nation ⋈ region → revenue per nation.
  // customer/nation/region are dimension tables → broadcast them; the
  // only shuffle left is the final small groupBy. At 100 TB orders is
  // the fact side and never shuffles for the join.
  val q05_star_join: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy("r_name", "n_name")
  }

  val q05_sql: String =
    """SELECT r_name, n_name, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  // Left-semi join (EXISTS): customers that placed at least one order
  // above a threshold. Semi-join never duplicates the left side and the
  // build side carries only the join key.
  val q06_semi_join: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val q06_sql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q07
  // Left-anti join (NOT EXISTS): customers with no large order —
  // complement of q06's semi-join on the same predicate.
  val q07_anti_join: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val q07_sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q08
  // Window / rank (SURVEY §2.5): top-3 orders per market segment.
  // row_number with a full deterministic tie-break, then filter — Spark
  // runs this as a single window after one shuffle on the partition key.
  val q08_window_rank: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
      .orderBy("c_mktsegment", "rn")
  }

  val q08_sql: String =
    """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey) t
      |WHERE rn <= 3
      |ORDER BY c_mktsegment, rn""".stripMargin

  // ---------------------------------------------------------------- q09
  // Running (cumulative) window aggregate per supplier over ship date.
  // Exact decimal running sum so both engines agree bitwise.
  val q09_window_running: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    // quantity+price window tie-breakers: (suppkey, shipdate, orderkey,
    // linenumber) happens to be unique in today's data, but a tied
    // cumulative order would be engine-dependent — make it total
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc,
        col("l_quantity").asc, col("l_extendedprice").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.filter(col("l_suppkey") <= 10)
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(dec(col("l_extendedprice"))).over(w).cast("double").as("running_rev"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "running_rev")
  }

  val q09_sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC,
      |             l_quantity ASC, l_extendedprice ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
      |FROM lineitem WHERE l_suppkey <= 10
      |ORDER BY l_suppkey, l_orderkey, l_linenumber, running_rev""".stripMargin

  // ---------------------------------------------------------------- q10
  // O3: ORDER BY … LIMIT top-k — Spark plans TakeOrderedAndProject
  // (per-partition heap + merge, no full sort; O(n) not O(n log n)).
  val q10_topk: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(10)

  val q10_sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q11
  // U1: union-by-name of two differently-built frames, then aggregate.
  val q11_union: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("id"), lit("customer").as("kind"), col("c_acctbal").as("bal"))
    val p = Tables.load(s, dir, "supplier")
      .select(col("s_suppkey").as("id"), lit("supplier").as("kind"), col("s_acctbal").as("bal"))
    c.unionByName(p)
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum(dec(col("bal"))).cast("double").as("total_bal"))
      .orderBy("kind")
  }

  val q11_sql: String =
    """SELECT kind, count(*) AS n,
      |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM (
      |  SELECT c_custkey AS id, 'customer' AS kind, c_acctbal AS bal FROM customer
      |  UNION ALL
      |  SELECT s_suppkey AS id, 'supplier' AS kind, s_acctbal AS bal FROM supplier) t
      |GROUP BY kind ORDER BY kind""".stripMargin

  // ---------------------------------------------------------------- q12
  // Distinct (hash aggregate on the distinct key).
  val q12_distinct: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .select("c_mktsegment").distinct()
      .orderBy("c_mktsegment")

  val q12_sql: String =
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"

  // ---------------------------------------------------------------- q13
  // A8: exact interpolating quantiles (pandas-style linear interpolation;
  // reference EDA cell 13). Since round 10 the quantiles come from the
  // distributed-rank construction (Stats.groupedPercentilesExact, q225)
  // rather than `percentile`'s per-group value buffer — bit-identical
  // results (the formula is Spark's own), bounded shuffle at any scale.
  val q13_quantiles: Q = (s, dir) =>
    graft.analytics.Stats.groupedPercentilesExact(
      Tables.load(s, dir, "customer"), lit(1), col("c_acctbal"),
      Seq(0.25, 0.50, 0.75, 0.99))
      .groupBy("grp")
      .agg(
        round(min(when(col("p") === 0.25, col("q"))), 6).as("p25"),
        round(min(when(col("p") === 0.50, col("q"))), 6).as("p50"),
        round(min(when(col("p") === 0.75, col("q"))), 6).as("p75"),
        round(min(when(col("p") === 0.99, col("q"))), 6).as("p99"))
      .drop("grp")

  val q13_sql: String =
    """SELECT round(quantile_cont(c_acctbal, 0.25), 6) AS p25,
      |  round(quantile_cont(c_acctbal, 0.50), 6) AS p50,
      |  round(quantile_cont(c_acctbal, 0.75), 6) AS p75,
      |  round(quantile_cont(c_acctbal, 0.99), 6) AS p99
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------- q14
  // A7/P7: z-score outlier census with *population* stddev (the
  // reference uses pandas ddof=0 — SURVEY §7.4.3). The scalar stats are
  // broadcast back with a cross join of a 1-row aggregate, the Spark
  // equivalent of the reference's scalar subquery (J2).
  val q14_zscore_outliers: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    val stats = li.agg(
      avg(col("l_extendedprice")).as("m"),
      stddev_pop(col("l_extendedprice")).as("sd"))
    li.crossJoin(broadcast(stats))
      .filter(abs((col("l_extendedprice") - col("m")) / col("sd")) > 2.5)
      .agg(count(lit(1)).as("n_outliers"))
  }

  val q14_sql: String =
    """WITH s AS (SELECT avg(l_extendedprice) AS m, stddev_pop(l_extendedprice) AS sd
      |           FROM lineitem)
      |SELECT count(*) AS n_outliers FROM lineitem, s
      |WHERE abs((l_extendedprice - m) / sd) > 2.5""".stripMargin

  // --------------------------------------------------------------- q221
  // MAD outlier census (modified z-score): the ROBUST sibling of q14's
  // mean/stddev gate and q64/q90's IQR fences — a single extreme value
  // drags a mean and inflates a stddev enough to mask its neighbors,
  // while medians have 50% breakdown. Per group: median, MAD, and the
  // count where 0.6745·|x − median| / MAD > 3.5, compared in
  // cross-multiplied integer-literal form so no non-exact decimal
  // literal enters double math.
  val q221_mad_outliers: Q = (s, dir) =>
    graft.etl.Clean.madOutlierCensus(Tables.load(s, dir, "lineitem"),
      col("l_returnflag"), col("l_extendedprice"))

  val q221_sql: String =
    """WITH b AS (SELECT l_returnflag AS grp, CAST(l_extendedprice AS DOUBLE) AS x
      |           FROM lineitem WHERE l_extendedprice IS NOT NULL),
      |md AS (SELECT grp, quantile_cont(x, 0.5) AS med FROM b GROUP BY grp),
      |d AS (SELECT b.grp, abs(x - med) AS ad FROM b JOIN md USING (grp)),
      |sp AS (SELECT d.grp, min(md.med) AS med2, quantile_cont(ad, 0.5) AS mad0
      |       FROM d JOIN md USING (grp) GROUP BY d.grp)
      |SELECT d.grp, CAST(count(*) AS BIGINT) AS n,
      |  round(min(sp.med2), 6) AS median, round(min(sp.mad0), 6) AS mad,
      |  CAST(sum(CASE WHEN d.ad * 6745.0 > sp.mad0 * 35000.0
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  CAST(sum(CASE WHEN d.ad * 6745.0 > sp.mad0 * 35000.0
      |      THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // count(*) AS outlier_micro
      |FROM d JOIN sp USING (grp) GROUP BY d.grp ORDER BY d.grp""".stripMargin

  // --------------------------------------------------------------- q225
  // The distributed exact-percentile construction itself, oracle-checked
  // over the widest useful probe set on the exact column whose per-group
  // `percentile` BUFFER was the repo's one remaining scale-killer (q221
  // shuffled 412 MB into 3 aggregation buffers at sf1 — an OOM at 100×,
  // since the buffer holds every value of the group). Stats.
  // groupedPercentilesExact compresses to distinct (group, value) counts
  // (map-side combine), range-buckets the within-group prefix sum so no
  // partition holds a whole group (l_extendedprice is ~97% distinct —
  // compression alone wouldn't save the sort), and interpolates with
  // Spark `percentile`'s own double formula, so this must hash-match
  // DuckDB's quantile_cont exactly like the buffered form did. q221/
  // q13/q64/q83 now run on the same construction; their unchanged
  // hashes are the ≡ proof.
  val q225_dist_quantiles: Q = (s, dir) =>
    graft.analytics.Stats.groupedPercentilesExact(
      Tables.load(s, dir, "lineitem"),
      col("l_returnflag"), col("l_extendedprice"),
      Seq(0.01, 0.25, 0.5, 0.75, 0.99))
      .select(col("grp").as("l_returnflag"), col("p"),
        round(col("q"), 6).as("q"))
      .orderBy("l_returnflag", "p")

  val q225_sql: String = Seq(0.01, 0.25, 0.5, 0.75, 0.99).map { p =>
    s"""SELECT l_returnflag, CAST($p AS DOUBLE) AS p,
       |  round(quantile_cont(l_extendedprice, $p), 6) AS q
       |FROM lineitem GROUP BY l_returnflag""".stripMargin
  }.mkString("\nUNION ALL\n") + "\nORDER BY l_returnflag, p"

  // ---------------------------------------------------------------- q15
  // A11/A12: pairwise Pearson correlation (reference EDA corr matrix).
  val q15_corr: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem").agg(
      round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
      round(corr(col("l_extendedprice"), col("l_discount")), 6).as("corr_price_disc"),
      round(corr(col("l_quantity"), col("l_tax")), 6).as("corr_qty_tax"))

  val q15_sql: String =
    """SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      |  round(corr(l_extendedprice, l_discount), 6) AS corr_price_disc,
      |  round(corr(l_quantity, l_tax), 6) AS corr_qty_tax
      |FROM lineitem""".stripMargin

  val all: Map[String, Q] = Map(
    "q01_scan_filter" -> q01_scan_filter,
    "q02_cast_coerce" -> q02_cast_coerce,
    "q03_agg_global" -> q03_agg_global,
    "q04_group_agg" -> q04_group_agg,
    "q05_star_join" -> q05_star_join,
    "q06_semi_join" -> q06_semi_join,
    "q07_anti_join" -> q07_anti_join,
    "q08_window_rank" -> q08_window_rank,
    "q09_window_running" -> q09_window_running,
    "q10_topk" -> q10_topk,
    "q11_union" -> q11_union,
    "q12_distinct" -> q12_distinct,
    "q13_quantiles" -> q13_quantiles,
    "q14_zscore_outliers" -> q14_zscore_outliers,
    "q221_mad_outliers" -> q221_mad_outliers,
    "q225_dist_quantiles" -> q225_dist_quantiles,
    "q15_corr" -> q15_corr)

  val oracle: Map[String, String] = Map(
    "q01_scan_filter" -> q01_sql,
    "q02_cast_coerce" -> q02_sql,
    "q03_agg_global" -> q03_sql,
    "q04_group_agg" -> q04_sql,
    "q05_star_join" -> q05_sql,
    "q06_semi_join" -> q06_sql,
    "q07_anti_join" -> q07_sql,
    "q08_window_rank" -> q08_sql,
    "q09_window_running" -> q09_sql,
    "q10_topk" -> q10_sql,
    "q11_union" -> q11_sql,
    "q12_distinct" -> q12_sql,
    "q13_quantiles" -> q13_sql,
    "q14_zscore_outliers" -> q14_sql,
    "q221_mad_outliers" -> q221_sql,
    "q225_dist_quantiles" -> q225_sql,
    "q15_corr" -> q15_sql)
}

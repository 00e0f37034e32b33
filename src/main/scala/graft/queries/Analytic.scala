package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.analytics.Kpis

/** KPI / date-time / grouping-set operators (SURVEY.md §2.2, §2.4) over
  * the star-schema testdata. Same determinism rules as [[Relational]].
  */
object Analytic {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  type Q = (SparkSession, String) => DataFrame

  /** y_true / y_pred frame: actual lineitem revenue vs the list-price
    * model `quantity * retailprice * (1 - discount)` — a stand-in for the
    * reference's model-scoring output (consumer.py:162-165). The part
    * dimension is broadcast: at 100 TB lineitem never shuffles here. */
  private def scored(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val p = Tables.load(s, dir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .select(
        col("l_returnflag"),
        col("l_extendedprice").as("y_true"),
        (col("l_quantity") * col("p_retailprice") * (lit(1.0) - col("l_discount"))).as("y_pred"))
  }

  private val scoredSql: String =
    """SELECT l_returnflag, l_extendedprice AS y_true,
      |       l_quantity * p_retailprice * (1 - l_discount) AS y_pred
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  // ---------------------------------------------------------------- q16
  // A1-A4: global regression KPIs — n, MAE, RMSE, R² — in ONE pass
  // (single aggregate, no scalar-subquery second scan; SURVEY §2.3 J2).
  val q16_kpi_global: Q = (s, dir) =>
    Kpis.regressionMetrics(scored(s, dir), col("y_true"), col("y_pred"))

  val q16_sql: String =
    s"""WITH t AS ($scoredSql)
       |SELECT count(*) AS n,
       |  round(avg(abs(y_true - y_pred)), 6) AS mae,
       |  round(sqrt(avg(power(y_true - y_pred, 2))), 6) AS rmse,
       |  round(1 - sum(power(y_true - y_pred, 2))
       |          / nullif(count(*) * var_pop(y_true), 0), 6) AS r2
       |FROM t""".stripMargin

  // ---------------------------------------------------------------- q17
  // A5: grouped KPIs (reference "KPIs por año", Reporte_Tecnico.md:508-523).
  val q17_kpi_grouped: Q = (s, dir) =>
    Kpis.groupedMetrics(scored(s, dir), Seq("l_returnflag"), col("y_true"), col("y_pred"))
      .orderBy("l_returnflag")

  val q17_sql: String =
    s"""WITH t AS ($scoredSql)
       |SELECT l_returnflag, count(*) AS n,
       |  round(avg(abs(y_true - y_pred)), 6) AS mae,
       |  round(sqrt(avg(power(y_true - y_pred, 2))), 6) AS rmse
       |FROM t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q18
  // O3/O4: top-k worst model errors with full deterministic tie-break
  // (reference top10_peores_errores) — TakeOrderedAndProject, no full sort.
  val q18_topk_errors: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    val p = Tables.load(s, dir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_extendedprice") -
          col("l_quantity") * col("p_retailprice") * (lit(1.0) - col("l_discount"))), 6)
          .as("abs_error"))
      .orderBy(col("abs_error").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(10)
  }

  val q18_sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  round(abs(l_extendedprice - l_quantity * p_retailprice * (1 - l_discount)), 6) AS abs_error
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |ORDER BY abs_error DESC, l_orderkey ASC, l_linenumber ASC
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q19
  // ROLLUP grouping sets over the region→nation hierarchy. Explicit
  // NULLS FIRST so Spark (nulls-first default) and DuckDB (nulls-last
  // default) order the subtotal rows identically.
  val q19_rollup: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), sum(dec(col("c_acctbal"))).cast("double").as("bal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  val q19_sql: String =
    """SELECT r_name, n_name, count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q20
  // Date-part aggregation: orders per (year, month). Session TZ is UTC on
  // both engines so date parts agree.
  val q20_date_agg: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy("y", "m")

  val q20_sql: String =
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
      |  CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
      |  count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin

  // ---------------------------------------------------------------- q21
  // Tumbling-window aggregation over the event stream table — the batch
  // twin of the Structured Streaming path (SURVEY §2.9); hour buckets
  // emitted as strings (never raw timestamps — parquet/duckdb tz traps).
  val q21_events_hourly: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy("hour", "event_type")

  val q21_sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin

  // ---------------------------------------------------------------- q22
  // J2: scalar "subquery" — global mean broadcast into a per-row
  // predicate (the reference's R² CTE pattern). One tiny 1-row aggregate
  // cross-joined (broadcast) against the table: no second shuffle.
  val q22_scalar_subquery: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val thr = c.agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("thr"))
    c.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .select("c_custkey", "c_acctbal")
      .orderBy("c_custkey")
  }

  val q22_sql: String =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |                          / count(*) FROM customer)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q23
  // P9: winsorize / clip at the exact 1%/99% quantiles (reference EDA
  // cell 18), quantiles broadcast from a 1-row frame — computed by the
  // distributed-rank construction (Stats.groupedPercentilesExact, q225)
  // since round 10: same bits as `percentile`, no value buffer.
  val q23_winsorize: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val q = graft.analytics.Stats.groupedPercentilesExact(
      c, lit(1), col("c_acctbal"), Seq(0.01, 0.99))
      .groupBy("grp")
      .agg(min(when(col("p") === 0.01, col("q"))).as("lo"),
        min(when(col("p") === 0.99, col("q"))).as("hi"))
      .drop("grp")
    c.crossJoin(broadcast(q))
      .select(
        col("c_custkey"),
        round(least(greatest(col("c_acctbal"), col("lo")), col("hi")), 6).as("clipped"))
      .orderBy("c_custkey")
  }

  val q23_sql: String =
    """WITH q AS (SELECT quantile_cont(c_acctbal, 0.01) AS lo,
      |                  quantile_cont(c_acctbal, 0.99) AS hi FROM customer)
      |SELECT c_custkey, round(least(greatest(c_acctbal, lo), hi), 6) AS clipped
      |FROM customer, q ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q24
  // P8 + CASE bucketing: range predicate with null-pass + conditional
  // bucket labels.
  val q24_case_buckets: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .filter(col("o_totalprice").between(1000.0, 500000.0) || col("o_totalprice").isNull)
      .select(
        when(col("o_totalprice") < 50000.0, "small")
          .when(col("o_totalprice") < 200000.0, "medium")
          .otherwise("large").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  val q24_sql: String =
    """SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
      |            WHEN o_totalprice < 200000.0 THEN 'medium'
      |            ELSE 'large' END AS bucket,
      |  count(*) AS n
      |FROM orders
      |WHERE o_totalprice BETWEEN 1000.0 AND 500000.0 OR o_totalprice IS NULL
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  val all: Map[String, Q] = Map(
    "q16_kpi_global" -> q16_kpi_global,
    "q17_kpi_grouped" -> q17_kpi_grouped,
    "q18_topk_errors" -> q18_topk_errors,
    "q19_rollup" -> q19_rollup,
    "q20_date_agg" -> q20_date_agg,
    "q21_events_hourly" -> q21_events_hourly,
    "q22_scalar_subquery" -> q22_scalar_subquery,
    "q23_winsorize" -> q23_winsorize,
    "q24_case_buckets" -> q24_case_buckets)

  val oracle: Map[String, String] = Map(
    "q16_kpi_global" -> q16_sql,
    "q17_kpi_grouped" -> q17_sql,
    "q18_topk_errors" -> q18_sql,
    "q19_rollup" -> q19_sql,
    "q20_date_agg" -> q20_sql,
    "q21_events_hourly" -> q21_sql,
    "q22_scalar_subquery" -> q22_sql,
    "q23_winsorize" -> q23_sql,
    "q24_case_buckets" -> q24_sql)
}

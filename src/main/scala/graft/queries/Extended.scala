package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Extension-surface queries beyond the round-1 inventory: outer joins,
  * correlated subqueries, lateral explode, grouping sets, non-equi range
  * join, salted skew join, per-group quantiles, conditional aggregation,
  * string/date/array function suites, JSON extraction, shingle Jaccard,
  * dedup representatives. Same determinism rules as [[Relational]].
  */
object Extended {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q53
  // n-gram (3-shingle) Jaccard similarity join — the shingle-level
  // exact near-dup check (word order matters, unlike token-set q28).
  private val ShingleCap = 500
  val q53_ngram_jaccard: Q = (s, dir) =>
    Dedup.jaccardSimJoinOn(
      Tables.load(s, dir, "documents").filter(col("doc_id") < ShingleCap),
      col("doc_id"),
      TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3), 0.8)
      .orderBy("id_a", "id_b")

  val q53_sql: String =
    s"""WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |           FROM documents WHERE doc_id < $ShingleCap),
       |g AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
       |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS gs FROM d),
       |w AS (SELECT DISTINCT doc_id, UNNEST(gs) AS tok FROM g),
       |sz AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |          FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
       |FROM inter
       |JOIN sz sa ON id_a = sa.doc_id
       |JOIN sz sb ON id_b = sb.doc_id
       |WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= 0.8
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q54
  // LEFT OUTER join + null handling: every customer, including the ones
  // with no orders (coalesce to zero).
  val q54_left_join: Q = (s, dir) => {
    val oAgg = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("__n"), sum(dec(col("o_totalprice"))).as("__p"))
    Tables.load(s, dir, "customer")
      .join(oAgg, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("__n"), lit(0L)).as("n_orders"),
        coalesce(col("__p").cast("double"), lit(0.0)).as("spent"))
      .orderBy("c_custkey")
  }

  val q54_sql: String =
    """SELECT c_custkey, c_name,
      |  coalesce(n, 0) AS n_orders,
      |  coalesce(CAST(p AS DOUBLE), 0.0) AS spent
      |FROM customer
      |LEFT JOIN (SELECT o_custkey, count(*) AS n,
      |             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS p
      |           FROM orders GROUP BY o_custkey) o
      |  ON c_custkey = o_custkey
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q55
  // FULL OUTER join: per-nation supplier stats vs customer stats where
  // either side can be missing.
  val q55_full_outer: Q = (s, dir) => {
    val sup = Tables.load(s, dir, "supplier")
      .filter(col("s_acctbal") > 5000)
      .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
    val cust = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
    sup.join(cust, Seq("nk"), "full")
      .select(col("nk"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"))
      .orderBy("nk")
  }

  val q55_sql: String =
    """SELECT coalesce(s.nk, c.nk) AS nk,
      |  coalesce(n_supp, 0) AS n_supp,
      |  coalesce(n_cust, 0) AS n_cust
      |FROM (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier
      |      WHERE s_acctbal > 5000 GROUP BY 1) s
      |FULL OUTER JOIN
      |     (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer
      |      WHERE c_mktsegment = 'BUILDING' GROUP BY 1) c
      |  ON s.nk = c.nk
      |ORDER BY nk""".stripMargin

  // ---------------------------------------------------------------- q56
  // Correlated EXISTS subquery through the SQL front end — Catalyst
  // rewrites it to a semi join (no per-row re-execution).
  val q56_exists_subquery: Q = (s, dir) => {
    Tables.load(s, dir, "part").createOrReplaceTempView("part")
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT p_partkey, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity >= 49)
        |ORDER BY p_partkey""".stripMargin)
  }

  val q56_sql: String =
    """SELECT p_partkey, p_brand FROM part
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_partkey = p_partkey AND l_quantity >= 49)
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q57
  // Lateral explode with ordinality (posexplode) — the UDTF/generator
  // surface, flattening token arrays into (doc, position, token) rows.
  val q57_posexplode: Q = (s, dir) =>
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 30)
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "token")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
      .orderBy("doc_id", "pos")

  val q57_sql: String =
    """SELECT doc_id,
      |  UNNEST(generate_series(0, len(regexp_split_to_array(trim(text), '\s+')) - 1)) AS pos,
      |  UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token
      |FROM documents WHERE doc_id < 30
      |ORDER BY doc_id, pos""".stripMargin

  // ---------------------------------------------------------------- q58
  // String-function suite (F-ops surface): case, slice, pad, concat,
  // replace, regex extract, reverse, split_part.
  val q58_string_funcs: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        upper(col("c_name")).as("u"),
        lower(col("c_mktsegment")).as("l"),
        substring(col("c_name"), 3, 5).as("sub"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("pad"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("cw"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        reverse(col("c_name")).as("rev"),
        split_part(col("c_name"), lit("#"), lit(2)).as("part2"),
        length(col("c_name")).cast("long").as("len"))
      .orderBy("c_custkey")

  val q58_sql: String =
    """SELECT c_custkey,
      |  upper(c_name) AS u,
      |  lower(c_mktsegment) AS l,
      |  substr(c_name, 3, 5) AS sub,
      |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
      |  concat_ws('-', c_mktsegment, c_name) AS cw,
      |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
      |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
      |  reverse(c_name) AS rev,
      |  split_part(c_name, '#', 2) AS part2,
      |  length(c_name) AS len
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q59
  // Date/time-function suite over order dates: truncation, extraction,
  // arithmetic, boundaries. Dates emitted as strings (tz-trap rule).
  val q59_date_funcs: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dow"),
        dayofyear(col("o_orderdate")).as("doy"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"),
        datediff(col("o_orderdate").cast("date"), lit("2024-01-01").cast("date")).as("age_days"))
      .orderBy("o_orderkey")

  val q59_sql: String =
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS d,
      |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
      |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS q,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
      |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
      |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
      |  CAST(datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS INT) AS age_days
      |FROM orders WHERE o_orderkey < 500
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q60
  // Array-function suite via grouped collect: sorted lists, element
  // access, slicing, higher-order aggregation — emitted as scalars
  // (array-typed outputs don't survive the oracle's pandas compare).
  val q60_array_funcs: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(sort_array(collect_list(col("c_acctbal"))).as("arr"))
      .select(col("c_nationkey"),
        size(col("arr")).cast("long").as("n"),
        element_at(col("arr"), 1).as("lo"),
        element_at(col("arr"), -1).as("hi"),
        round(aggregate(slice(col("arr"), 1, 3), lit(0.0), (acc, x) => acc + x), 6)
          .as("bottom3_sum"))
      .orderBy("c_nationkey")

  val q60_sql: String =
    """WITH a AS (SELECT c_nationkey, list_sort(list(c_acctbal)) AS arr
      |  FROM customer GROUP BY c_nationkey)
      |SELECT c_nationkey,
      |  len(arr) AS n,
      |  arr[1] AS lo,
      |  arr[-1] AS hi,
      |  round(list_sum(arr[1:3]), 6) AS bottom3_sum
      |FROM a ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q61
  // GROUPING SETS with grouping_id — finer than rollup/cube (q19/q41):
  // an explicit set list, plus the marker distinguishing "null data"
  // from "aggregated-away".
  val q61_grouping_sets: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("qty"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q61_sql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
      |  grouping(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q62
  // Non-equi range join: prices against a literal band table. The tiny
  // side broadcasts; Spark plans BroadcastNestedLoopJoin — the right
  // shape when one side is rows-not-data.
  val q62_range_join: Q = (s, dir) => {
    val spark = s
    import spark.implicits._
    val bands = (0 until 10)
      .map(b => (b, b * 11000.0, (b + 1) * 11000.0))
      .toDF("band", "lo", "hi")
    Tables.load(s, dir, "lineitem")
      .join(broadcast(bands),
        col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_extendedprice"))).cast("double").as("total"))
      .orderBy("band")
  }

  val q62_sql: String = {
    val rows = (0 until 10)
      .map(b => s"(${b}, ${b * 11000.0}, ${(b + 1) * 11000.0})").mkString(", ")
    s"""SELECT band, count(*) AS n,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       |FROM lineitem
       |JOIN (VALUES $rows) AS bands(band, lo, hi)
       |  ON l_extendedprice >= lo AND l_extendedprice < hi
       |GROUP BY band ORDER BY band""".stripMargin
  }

  // ---------------------------------------------------------------- q63
  // Salted skew join (Operators.saltedJoin): result identical to the
  // plain equi-join — the oracle checks exactly that — while the
  // physical plan splits each hot key across `salts` reducers.
  val q63_salted_join: Q = (s, dir) => {
    val p = Tables.load(s, dir, "part").filter(col("p_size") >= 40)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    graft.operators.Operators
      .saltedJoin(Tables.load(s, dir, "lineitem"), p, Seq("l_partkey"), salts = 8)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).cast("double").as("qty"))
      .orderBy("p_brand")
  }

  val q63_sql: String =
    """SELECT p_brand, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size >= 40
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q64
  // Exact interpolated quantiles per group (q13 is global). Runs on the
  // distributed-rank construction since round 10 (see q225) — same
  // bits, no per-group percentile buffer.
  val q64_group_quantiles: Q = (s, dir) =>
    graft.analytics.Stats.groupedPercentilesExact(
      Tables.load(s, dir, "lineitem"), col("l_returnflag"), col("l_quantity"),
      Seq(0.25, 0.50, 0.75))
      .groupBy("grp")
      .agg(
        round(min(when(col("p") === 0.25, col("q"))), 6).as("p25"),
        round(min(when(col("p") === 0.50, col("q"))), 6).as("p50"),
        round(min(when(col("p") === 0.75, col("q"))), 6).as("p75"))
      .select(col("grp").as("l_returnflag"), col("p25"), col("p50"), col("p75"))
      .orderBy("l_returnflag")

  val q64_sql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
      |  round(quantile_cont(l_quantity, 0.50), 6) AS p50,
      |  round(quantile_cont(l_quantity, 0.75), 6) AS p75
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------- q233
  // Grouped exact percentiles at HIGH group cardinality — q64 runs on
  // 3 groups (l_returnflag); this runs the distributed-rank BUCKETED
  // construction over l_partkey (~2·10⁴ groups at the driver's bench
  // SF, scaling linearly), pinning that the groups × buckets offset
  // machinery (incl. its AQE-sized, never-forced-broadcast joins)
  // stays correct where the offsets frame is groups-sized.
  // maxFoldBytes = 0 forces the scale plan past the adaptive fold
  // cut-over, so THIS oracle covers the bucketed shape continuously
  // at every SF — without it, small-SF gates would route to the fold
  // path and the scale construction would only ever run unchecked at
  // bench SFs. Same pivot/rounding discipline as q64.
  val q233_partkey_quantiles: Q = (s, dir) =>
    graft.analytics.Stats.groupedPercentilesExact(
      Tables.load(s, dir, "lineitem"), col("l_partkey"),
      col("l_extendedprice"), Seq(0.25, 0.50, 0.75), maxFoldBytes = 0)
      .groupBy("grp")
      .agg(
        round(min(when(col("p") === 0.25, col("q"))), 6).as("p25"),
        round(min(when(col("p") === 0.50, col("q"))), 6).as("p50"),
        round(min(when(col("p") === 0.75, col("q"))), 6).as("p75"))
      .select(col("grp").as("l_partkey"), col("p25"), col("p50"), col("p75"))
      .orderBy("l_partkey")

  val q233_sql: String =
    """SELECT l_partkey,
      |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
      |  round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
      |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin

  // --------------------------------------------------------------- q228
  // Grouped IQR outlier census (A10 as an ORACLE query — previously
  // spec-only): fences within each (group × feature), both features
  // from ONE melted compressed pass through the distributed-rank
  // construction with a STRUCT group key (feature, l_returnflag) —
  // the exact shape Clean.iqrOutlierCensusBy ships for production,
  // hash-checked end to end against DuckDB's quantile_cont.
  val q228_iqr_census_by: Q = (s, dir) =>
    graft.etl.Clean.iqrOutlierCensusBy(Tables.load(s, dir, "lineitem"),
      Seq("l_quantity", "l_extendedprice"), Seq("l_returnflag"))

  val q228_sql: String =
    """WITH t AS (
      |  SELECT l_returnflag, 'l_quantity' AS feature,
      |         CAST(l_quantity AS DOUBLE) AS v FROM lineitem
      |  UNION ALL
      |  SELECT l_returnflag, 'l_extendedprice',
      |         CAST(l_extendedprice AS DOUBLE) FROM lineitem),
      |f AS (SELECT l_returnflag, feature,
      |        quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
      |      FROM t GROUP BY 1, 2),
      |g AS (SELECT t.l_returnflag, t.feature,
      |        count(t.v) AS n,
      |        sum(CASE WHEN t.v < (q1 - (q3 - q1) * 1.5)
      |                   OR t.v > (q3 + (q3 - q1) * 1.5)
      |                 THEN 1 ELSE 0 END) AS n_outliers
      |      FROM t JOIN f USING (l_returnflag, feature)
      |      GROUP BY 1, 2)
      |SELECT l_returnflag, feature, CAST(n AS BIGINT) AS n,
      |  CAST(n_outliers AS BIGINT) AS n_outliers,
      |  round(CAST(n_outliers AS DOUBLE) / n * 100, 6) AS pct_outliers
      |FROM g ORDER BY feature, l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q65
  // Conditional aggregation: count_if / filtered avg via null-skipping
  // when() — the FILTER-clause surface.
  val q65_conditional_agg: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_totalprice") > 100000, 1L).otherwise(0L)).as("n_big"),
        round(avg(when(col("o_orderstatus") === "F", col("o_totalprice"))), 6)
          .as("avg_f_price"))
      .orderBy("o_orderpriority")

  val q65_sql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
      |  round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 6) AS avg_f_price
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q66
  // Dedup representative selection: keep the min-id document per
  // identical-content group (deterministic, unlike dropDuplicates).
  val q66_dedup_first: Q = (s, dir) =>
    Dedup.dropExactDups(Tables.load(s, dir, "documents"),
        col("doc_id"), col("text"))
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")

  val q66_sql: String =
    """SELECT doc_id, source FROM documents
      |QUALIFY row_number() OVER (
      |  PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
      |  ORDER BY doc_id) = 1
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q67
  // Semi-structured extraction: JSON payload parsing (reference F7,
  // producer/consumer JSON codec) — from_json keeps it codegen-able.
  val q67_json_extract: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .select(col("event_id"),
        from_json(col("props"), lit("k INT")).getField("k").as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
      .orderBy("k")

  val q67_sql: String =
    """SELECT CAST(json_extract(props, '$.k') AS INT) AS k, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q68
  // Window-function suite beyond rank/running-sum: ntile, percent_rank,
  // cume_dist, lag, lead — the full ranking/distribution surface.
  val q68_window_suite: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
    Tables.load(s, dir, "customer")
      .filter(col("c_custkey") < 300)
      .select(col("c_custkey"), col("c_nationkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        lag(col("c_acctbal"), 1).over(w).as("prev_bal"),
        lead(col("c_acctbal"), 1, -1.0).over(w).as("next_bal"))
      .orderBy("c_custkey")
  }

  val q68_sql: String =
    """SELECT c_custkey, c_nationkey,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pr,
      |  round(cume_dist() OVER w, 6) AS cd,
      |  lag(c_acctbal, 1) OVER w AS prev_bal,
      |  lead(c_acctbal, 1, -1.0) OVER w AS next_bal
      |FROM customer WHERE c_custkey < 300
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q69
  // Trailing-window frame: 3-row moving average strictly before the
  // current row (ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING). The window
  // order includes quantity+price tie-breakers: (suppkey, orderkey,
  // linenumber) is NOT unique in the synthetic data, and a frame over a
  // tied order is engine-dependent.
  val q69_moving_avg: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_suppkey"))
      .orderBy(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
      .rowsBetween(-3, -1)
    Tables.load(s, dir, "lineitem")
      .filter(col("l_suppkey") < 20)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(avg(col("l_quantity")).over(w), 6).as("trail_avg"))
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "trail_avg")
  }

  val q69_sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  round(avg(l_quantity) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 6) AS trail_avg
      |FROM lineitem WHERE l_suppkey < 20
      |ORDER BY l_suppkey, l_orderkey, l_linenumber,
      |         trail_avg ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q70
  // Selector aggregates: max_by/min_by (arg_max/arg_min) — keyed by the
  // unique custkey so ties can't make the answer nondeterministic.
  val q70_arg_minmax: Q = (s, dir) =>
    Tables.load(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(
        max_by(col("c_name"), col("c_custkey")).as("newest"),
        min_by(col("c_name"), col("c_custkey")).as("oldest"),
        max(col("c_acctbal")).as("best_bal"))
      .orderBy("c_nationkey")

  val q70_sql: String =
    """SELECT c_nationkey,
      |  arg_max(c_name, c_custkey) AS newest,
      |  arg_min(c_name, c_custkey) AS oldest,
      |  max(c_acctbal) AS best_bal
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q71
  // Pattern predicates: LIKE wildcards and regexp matching as filters.
  val q71_like_rlike: Q = (s, dir) =>
    Tables.load(s, dir, "part")
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("p_name").like("%widget%"), 1L).otherwise(0L)).as("n_widget"),
        sum(when(col("p_type").like("PRO%"), 1L).otherwise(0L)).as("n_promo"),
        sum(when(col("p_name").rlike("[aeiou]{2}"), 1L).otherwise(0L)).as("n_vv"))
      .orderBy("p_brand")

  val q71_sql: String =
    """SELECT p_brand, count(*) AS n,
      |  count(*) FILTER (WHERE p_name LIKE '%widget%') AS n_widget,
      |  count(*) FILTER (WHERE p_type LIKE 'PRO%') AS n_promo,
      |  count(*) FILTER (WHERE regexp_matches(p_name, '[aeiou]{2}')) AS n_vv
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q72
  // Nested types: struct construction, comparison-based max, field
  // access — scalars out (nested outputs don't survive the pandas
  // compare deterministically).
  val q72_structs: Q = (s, dir) =>
    Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("best"))
      .select(col("o_custkey"),
        col("best.o_orderkey").as("top_order"),
        col("best.o_totalprice").as("top_price"))
      .orderBy("o_custkey")

  val q72_sql: String =
    """SELECT o_custkey, o_orderkey AS top_order, o_totalprice AS top_price
      |FROM orders
      |QUALIFY row_number() OVER (PARTITION BY o_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey DESC) = 1
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q73
  // Per-group top-k via the bounded-heap TypedImperativeAggregate
  // (expressions.TopKByScore): map-side partial combine ships at most k
  // entries per group per task into the shuffle — unlike the window
  // row_number formulation (the oracle), which shuffles and sorts every
  // row. Same answer, narrow shuffle.
  val q73_group_topk: Q = (s, dir) => {
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(graft.expressions.TopKAgg
        .top_k_ids(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("c_mktsegment"), (col("i") + 1).cast("long").as("rn"),
        col("e.id").as("o_orderkey"), col("e.score").as("o_totalprice"))
      .orderBy("c_mktsegment", "rn")
  }

  val q73_sql: String =
    """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey) t
      |WHERE rn <= 3
      |ORDER BY c_mktsegment, rn""".stripMargin

  // ---------------------------------------------------------------- q74
  // unionByName with missing columns (the reference's U1 alignment rule
  // generalized): frames with different column sets align by NAME and
  // null-fill the gaps — positional UNION would silently mismatch.
  val q74_union_by_name: Q = (s, dir) => {
    val sup = Tables.load(s, dir, "supplier")
      .select(col("s_name").as("name"), col("s_nationkey").as("nationkey"),
        col("s_acctbal").as("acctbal"))
    val cust = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") < 200)
      .select(col("c_name").as("name"), col("c_nationkey").as("nationkey"),
        col("c_mktsegment").as("segment"))
    sup.unionByName(cust, allowMissingColumns = true)
      .orderBy("name")
  }

  val q74_sql: String =
    """SELECT * FROM (
      |  SELECT s_name AS name, s_nationkey AS nationkey, s_acctbal AS acctbal
      |  FROM supplier
      |  UNION ALL BY NAME
      |  SELECT c_name AS name, c_nationkey AS nationkey, c_mktsegment AS segment
      |  FROM customer WHERE c_custkey < 200)
      |ORDER BY name""".stripMargin

  // ---------------------------------------------------------------- q75
  // Regression/covariance aggregates (the reference's OLS surface as
  // single-pass SQL aggregates): slope/intercept/R² of price on
  // quantity per return flag.
  val q75_regression_aggs: Q = (s, dir) =>
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 6).as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 6).as("intercept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
        round(covar_pop(col("l_extendedprice"), col("l_quantity")), 6).as("cpop"),
        round(covar_samp(col("l_extendedprice"), col("l_quantity")), 6).as("csamp"))
      .orderBy("l_returnflag")

  val q75_sql: String =
    """SELECT l_returnflag,
      |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
      |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |  round(covar_pop(l_extendedprice, l_quantity), 6) AS cpop,
      |  round(covar_samp(l_extendedprice, l_quantity), 6) AS csamp
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q79
  // Unpivot/melt: wide → long (the inverse of q38's pivot).
  val q79_unpivot: Q = (s, dir) =>
    Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "attr", "val")
      .orderBy("p_partkey", "attr")

  val q79_sql: String =
    """SELECT p_partkey, attr, val FROM (
      |  UNPIVOT (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice
      |           FROM part)
      |  ON p_size, p_retailprice INTO NAME attr VALUE val)
      |ORDER BY p_partkey, attr""".stripMargin

  // ---------------------------------------------------------------- q80
  // Deterministic key-hash sampling (the reproducible-holdout
  // primitive): membership is a pure function of the row key, checked
  // here via the md5 bucket. Spark's RNG-based df.sample can never be
  // cross-engine-checked — this can.
  val q80_deterministic_sample: Q = (s, dir) =>
    graft.operators.Sampling.deterministicSample(
      Tables.load(s, dir, "documents"), Seq("doc_id"), 0.25,
      bucketOf = graft.operators.Sampling.md5KeyBucket)
      .select("doc_id", "source")
      .orderBy("doc_id")

  val q80_sql: String =
    """SELECT doc_id, source FROM documents
      |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || '42'), 1, 8) AS BIGINT)
      |      % 1000000 < 250000
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q82
  // Weighted systematic sampling (PPS): keep rows whose cumulative-
  // weight interval straddles a multiple of the step — probability ∝
  // token count, zero RNG, exact via the distributed prefix sum.
  val q82_weighted_sample: Q = (s, dir) => {
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
    graft.operators.Sampling
      .weightedSystematicSample(d, col("n_tok"), Seq(col("doc_id")), 5000.0)
      .orderBy("doc_id")
  }

  val q82_sql: String =
    """WITH t AS (SELECT doc_id,
      |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
      |  FROM documents),
      |r AS (SELECT doc_id, n_tok,
      |    sum(n_tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM t)
      |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok FROM r
      |WHERE floor(CAST(run AS DOUBLE) / 5000.0)
      |    > floor(CAST(run - n_tok AS DOUBLE) / 5000.0)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q83
  // Robust statistics: per-group median absolute deviation (exact,
  // interpolated) — the outlier-resistant spread measure profiling
  // pipelines prefer over stddev. Two-pass: per-group median broadcast
  // back, then the median of absolute deviations.
  val q83_mad: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    // both medians through the distributed-rank construction (q225) —
    // the per-group `percentile` buffer this used to carry is the shape
    // that OOMs at 100× (see Clean.madOutlierCensus, q221). ONE raw
    // scan: the deviation frame is a compressed-to-compressed regroup.
    val compX = li.select(col("l_returnflag"),
      col("l_quantity").cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("l_returnflag").as("grp"), col("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val med = graft.analytics.Stats.percentilesFromCounts(compX, Seq(0.5))
      .select(col("grp"), col("q").as("med"))
    val compAd = compX.join(broadcast(med), "grp")
      .select(col("grp"), abs(col("v") - col("med")).as("v"), col("c"))
      .groupBy("grp", "v").agg(sum("c").as("c"))
    val mad = graft.analytics.Stats.percentilesFromCounts(compAd, Seq(0.5))
      .select(col("grp"), col("q").as("mad0"))
    // the output is just the two per-group medians — join the two
    // group-sized frames, never re-touch the rows
    med.join(mad, "grp")
      .select(col("grp").as("l_returnflag"), round(col("med"), 6).as("median"),
        round(col("mad0"), 6).as("mad"))
      .orderBy("l_returnflag")
  }

  val q83_sql: String =
    """WITH m AS (SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
      |           FROM lineitem GROUP BY 1)
      |SELECT l.l_returnflag,
      |  round(min(med), 6) AS median,
      |  round(quantile_cont(abs(l_quantity - med), 0.5), 6) AS mad
      |FROM lineitem l JOIN m USING (l_returnflag)
      |GROUP BY l.l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q84
  // Time-series resampling with gap filling: a complete hour ×
  // event-type spine (sequence + broadcast cross join) left-joined to
  // the actual hourly counts, absent combinations zero-filled — the
  // stream-warehouse densification step dashboards need.
  val q84_resample: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
    val hours = e
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
    val types = e.select(col("event_type")).distinct()
    val counts = e
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    hours.crossJoin(broadcast(types))
      .join(counts, Seq("h", "event_type"), "left")
      .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("hour", "event_type")
  }

  val q84_sql: String =
    """WITH b AS (SELECT date_trunc('hour', min(ts)) AS lo,
      |                  date_trunc('hour', max(ts)) AS hi FROM events),
      |hours AS (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
      |types AS (SELECT DISTINCT event_type FROM events),
      |c AS (SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
      |      FROM events GROUP BY 1, 2)
      |SELECT strftime(hours.h, '%Y-%m-%d %H:%M:%S') AS hour,
      |  types.event_type AS event_type,
      |  coalesce(n, 0) AS n
      |FROM hours CROSS JOIN types
      |LEFT JOIN c ON c.h = hours.h AND c.event_type = types.event_type
      |ORDER BY hour, types.event_type""".stripMargin

  // ---------------------------------------------------------------- q85
  // Snapshot diff — the incremental-ETL primitive: compare two table
  // versions by key with a row content hash, classify added / removed /
  // changed / unchanged. Simulated prior snapshot: every 97th order
  // missing and F-status rows carrying an older (discounted) price.
  val q85_snapshot_diff: Q = (s, dir) => {
    val now = Tables.load(s, dir, "orders")
    val old = now.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderstatus") === "F", round(col("o_totalprice") * 0.9, 2))
          .otherwise(col("o_totalprice")))
    // price hashed as integer cents: double→string rendering is not
    // engine-portable, integer strings are
    def hashed(df: DataFrame, pfx: String) = df.select(
      col("o_orderkey").as(s"${pfx}_key"),
      md5(concat_ws("|", col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long"))).as(s"${pfx}_hash"))
    hashed(old, "old")
      .join(hashed(now, "new"), col("old_key") === col("new_key"), "full")
      .select(
        when(col("old_key").isNull, "added")
          .when(col("new_key").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
  }

  val q85_sql: String =
    """WITH now AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |             FROM orders),
      |old AS (SELECT o_orderkey, o_custkey, o_orderstatus,
      |          CASE WHEN o_orderstatus = 'F' THEN round(o_totalprice * 0.9, 2)
      |               ELSE o_totalprice END AS o_totalprice
      |        FROM orders WHERE o_orderkey % 97 <> 0),
      |ho AS (SELECT o_orderkey AS k,
      |         md5(CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
      |             CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)) AS h
      |       FROM old),
      |hn AS (SELECT o_orderkey AS k,
      |         md5(CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
      |             CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)) AS h
      |       FROM now)
      |SELECT CASE WHEN ho.k IS NULL THEN 'added'
      |            WHEN hn.k IS NULL THEN 'removed'
      |            WHEN ho.h <> hn.h THEN 'changed'
      |            ELSE 'unchanged' END AS status,
      |  count(*) AS n
      |FROM ho FULL OUTER JOIN hn ON ho.k = hn.k
      |GROUP BY 1 ORDER BY status""".stripMargin

  // ---------------------------------------------------------------- q86
  // Column profiler: per-column (rows, nulls, distinct, min, max, avg)
  // emitted as ROWS, computed in ONE pass — stack the columns into
  // (name, value) pairs (an Expand, no extra scans) and aggregate by
  // name. The generalized `describe` a data catalog runs per table.
  val q86_profile: Q = (s, dir) => {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val stackExpr = s"stack(${cols.length}, " +
      cols.map(c => s"'$c', $c").mkString(", ") + ") AS (col, val)"
    // group by (col, val) FIRST: every statistic — including the exact
    // distinct count and the decimal-exact mean — derives from the
    // (value, multiplicity) pairs, so the plan is one stack Expand and
    // one shuffle, with no countDistinct Expand on top.
    Tables.load(s, dir, "lineitem")
      .selectExpr(stackExpr)
      .groupBy(col("col"), col("val")).agg(count(lit(1)).as("c"))
      .groupBy(col("col"))
      .agg(
        sum(col("c")).as("n"),
        coalesce(sum(when(col("val").isNull, col("c"))), lit(0L)).as("nulls"),
        count(when(col("val").isNotNull, 1)).cast("long").as("n_distinct"),
        round(min(col("val")), 6).as("mn"),
        round(max(col("val")), 6).as("mx"),
        // mean via exact decimal sum: float avg is accumulation-order-
        // sensitive in the 6th decimal between engines
        round(sum(col("val").cast(DecimalType(25, 10)) * col("c")).cast("double")
          / sum(when(col("val").isNotNull, col("c"))), 6).as("mean"))
      .orderBy("col")
  }

  val q86_sql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val arms = cols.map { c =>
      s"""SELECT '$c' AS col, count(*) AS n,
         |  count(*) - count($c) AS nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  round(min($c), 6) AS mn, round(max($c), 6) AS mx,
         |  round(CAST(sum(CAST($c AS DECIMAL(25,10))) AS DOUBLE) / count($c), 6) AS mean
         |FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$arms\nORDER BY col"
  }

  // ---------------------------------------------------------------- q87
  // Per-label embedding centroids (the nearest-centroid / class-
  // prototype building block): elementwise mean per label via
  // posexplode + decimal-exact sums, emitted as (label, pos, m) rows.
  // First 8 dimensions — the filter runs BEFORE the aggregate.
  val q87_label_centroids: Q = (s, dir) =>
    Tables.load(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .filter(col("pos") < 8)
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      .agg(round(
        sum(col("x").cast("double").cast(DecimalType(25, 10))).cast("double")
          / count(lit(1)), 6).as("m"))
      .orderBy("label", "pos")

  val q87_sql: String =
    """SELECT label, pos,
      |  round(CAST(sum(CAST(CAST(embedding[pos + 1] AS DOUBLE) AS DECIMAL(25,10)))
      |             AS DOUBLE) / count(*), 6) AS m
      |FROM (SELECT label, embedding, UNNEST(generate_series(0, 7)) AS pos
      |      FROM embeddings)
      |GROUP BY label, pos ORDER BY label, pos""".stripMargin

  // ---------------------------------------------------------------- q90
  // IQR outlier census (SURVEY A9): per feature, the 1.5·IQR fences
  // and how many rows fall outside. Exact interpolated quartiles via
  // VALUE COMPRESSION: Spark's `percentile` buffers every raw value
  // (6-7 s here); instead one stacked pass builds (col, value, count),
  // quartiles come from cumulative counts over the distinct values
  // (order statistics on compressed data — the 100 TB shape), and the
  // outlier counts read the same compressed frame. One scan total.
  val q90_outlier_census: Q = (s, dir) => {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val stackExpr = s"stack(${cols.length}, " +
      cols.map(c => s"'$c', CAST($c AS DOUBLE)").mkString(", ") + ") AS (col, val)"
    // materialized once: both the fence computation and the outlier
    // count read this compressed frame, and the two join branches would
    // otherwise each re-run the stack scan
    val grouped = Tables.load(s, dir, "lineitem")
      .selectExpr(stackExpr)
      .groupBy(col("col"), col("val")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // Range-bucketed cumulative counts (the percentilesFromCounts /
    // withRunningTotal construction, inlined): the r13 form computed
    // `cum` with a window partitioned by `col` alone — 4 partitions,
    // which AQE coalesces into ONE task that sorts every column's
    // distinct values back-to-back (l_extendedprice is ~97% distinct,
    // so that task sorts nearly the whole compressed frame; StageProbe
    // showed the whole 5.1 MB exchange read by a single task). Split
    // each column's value axis into ~32 sketch-placed ranges: the
    // per-(col, bucket) totals make a tiny offsets frame, and the full
    // cumulative count is offset + running-sum-within-bucket — every
    // sort partition is a value slice, never a whole column. Counts
    // are exact BIGINTs, bucket boundaries only move WHERE the sums
    // are computed, and values are distinct per (col, val) group, so
    // cum/prev/n are bit-identical to the window form; the quartile
    // interpolation expressions below are untouched.
    val bounds = grouped.select(col("val"))
      .limit(1 << 17).stat
      .approxQuantile("val", (1 until 32).map(_ / 32.0).toArray, 0.01)
      .distinct.sorted
    val bktCol =
      if (bounds.isEmpty) lit(0)
      else bounds.map(b => when(col("val") >= b, 1).otherwise(0)).reduce(_ + _)
    val bucketed = grouped
      .withColumn("bkt", when(col("val").isNull, lit(-1)).otherwise(bktCol))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col")).orderBy(col("bkt"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("col"), col("bkt"))
      .agg(sum(col("c")).as("__bt"))
      .withColumn("off", coalesce(sum(col("__bt")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("__bt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("col"))))
      .select(col("col"), col("bkt"), col("off"), col("n"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col"), col("bkt")).orderBy(col("val"))
    val ranked = bucketed
      .join(broadcast(offsets), Seq("col", "bkt"))
      .withColumn("cum", col("off") + sum(col("c")).over(wIn))
      .withColumn("prev", col("cum") - col("c"))
    def h(p: Double) = lit(p) * (col("n") - 1) + 1
    def pick(pos: org.apache.spark.sql.Column) =
      max(when(col("prev") < pos && pos <= col("cum"), col("val")))
    val fences = ranked.groupBy(col("col"))
      .agg(min(col("n")).as("n"),
        pick(floor(h(0.25))).as("v1lo"), pick(ceil(h(0.25))).as("v1hi"),
        pick(floor(h(0.75))).as("v3lo"), pick(ceil(h(0.75))).as("v3hi"))
      .select(col("col"), col("n"),
        (col("v1lo") + (col("v1hi") - col("v1lo")) *
          (lit(0.25) * (col("n") - 1) + 1 - floor(lit(0.25) * (col("n") - 1) + 1)))
          .as("q1"),
        (col("v3lo") + (col("v3hi") - col("v3lo")) *
          (lit(0.75) * (col("n") - 1) + 1 - floor(lit(0.75) * (col("n") - 1) + 1)))
          .as("q3"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
    grouped.join(broadcast(fences), "col")
      .groupBy(col("col"))
      .agg(min(col("n")).as("n"),
        round(min(col("q1")), 6).as("q1"),
        round(min(col("q3")), 6).as("q3"),
        sum(when(col("val") < col("lo") || col("val") > col("hi"), col("c"))
          .otherwise(0L)).as("n_outliers"))
      .orderBy("col")
  }

  val q90_sql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val arms = cols.map { c =>
      s"""SELECT '$c' AS col, count(*) AS n,
         |  round(min(f.q1), 6) AS q1,
         |  round(min(f.q3), 6) AS q3,
         |  count(*) FILTER (WHERE $c < f.lo OR $c > f.hi) AS n_outliers
         |FROM lineitem CROSS JOIN (
         |  SELECT q1, q3, q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi
         |  FROM (SELECT quantile_cont($c, 0.25) AS q1,
         |               quantile_cont($c, 0.75) AS q3 FROM lineitem)) f""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$arms\nORDER BY col"
  }

  // ---------------------------------------------------------------- q91
  // RIGHT OUTER join (the remaining join type in the matrix: inner q05,
  // left q54, full q55, semi q06, anti q07, cross q62/q30): order
  // aggregates RIGHT-joined to every customer.
  val q91_right_join: Q = (s, dir) => {
    val oAgg = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    oAgg.join(Tables.load(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"), "right")
      .select(col("c_custkey"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("c_custkey")
  }

  val q91_sql: String =
    """SELECT c_custkey, coalesce(n_orders, 0) AS n_orders
      |FROM (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1) o
      |RIGHT JOIN customer ON o_custkey = c_custkey
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------- q158
  // Join-key skew census: for each prospective join/groupBy key, the
  // key-cardinality, hottest-key share, and max/avg imbalance — the
  // pre-flight audit that decides between a plain shuffle join,
  // salting (q63), or trusting AQE's skew split BEFORE launching the
  // 100 TB job. One map-side-combined groupBy per key; everything
  // after the first aggregate is key-cardinality-sized, and the
  // top-10 share plans as TakeOrderedAndProject, not a global sort.
  val q158_key_skew: Q = (s, dir) => {
    val audits: Seq[(String, DataFrame, String)] = Seq(
      ("lineitem.l_partkey", Tables.load(s, dir, "lineitem"), "l_partkey"),
      ("lineitem.l_suppkey", Tables.load(s, dir, "lineitem"), "l_suppkey"),
      ("orders.o_custkey", Tables.load(s, dir, "orders"), "o_custkey"),
      ("events.user_id", Tables.load(s, dir, "events"), "user_id"))
    audits.map { case (name, df, k) =>
      val perKey = df.groupBy(col(k).as("key")).agg(count(lit(1)).as("c"))
      val stats = perKey.agg(
        sum("c").as("n_rows"), count(lit(1)).as("n_keys"), max("c").as("max_rows"))
      val top10 = perKey.orderBy(col("c").desc, col("key").asc).limit(10)
        .agg(sum("c").as("t10"))
      stats.crossJoin(top10).select(
        lit(name).as("key_col"), col("n_rows"), col("n_keys"), col("max_rows"),
        round(col("max_rows").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double"), 6).as("imbalance"),
        round(col("t10").cast("double") / col("n_rows").cast("double"), 6)
          .as("top10_share"))
    }.reduce(_.unionAll(_)).orderBy("key_col")
  }

  val q158_sql: String = {
    def one(name: String, table: String, k: String): String =
      s"""SELECT '$name' AS key_col, CAST(sum(c) AS BIGINT) AS n_rows,
         |  CAST(count(*) AS BIGINT) AS n_keys, CAST(max(c) AS BIGINT) AS max_rows,
         |  round(CAST(max(c) AS DOUBLE) * count(*) / sum(c), 6) AS imbalance,
         |  round((SELECT sum(c) FROM (SELECT count(*) AS c, $k FROM $table
         |           GROUP BY $k ORDER BY c DESC, $k ASC LIMIT 10))
         |        / CAST(sum(c) AS DOUBLE), 6) AS top10_share
         |FROM (SELECT count(*) AS c FROM $table GROUP BY $k)""".stripMargin
    Seq(
      one("lineitem.l_partkey", "lineitem", "l_partkey"),
      one("lineitem.l_suppkey", "lineitem", "l_suppkey"),
      one("orders.o_custkey", "orders", "o_custkey"),
      one("events.user_id", "events", "user_id"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_col")
  }

  // --------------------------------------------------------------- q170
  // Skew-aware join, census-driven: q158's imbalance measurement wired
  // into the join strategy (Operators.skewAwareJoin). The derived key
  // funnels a third of events onto one hot key (imbalance ~30×), so
  // the operator MUST choose salting here (OperatorsSpec pins the
  // decision; it also pins plain-join on uniform keys) — and the
  // salted result must stay ≡ the plain join, which is exactly what
  // the DuckDB oracle computes. The aggregate on top makes the check
  // order-insensitive to the salt routing.
  val q170_skew_aware_join: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
      .withColumn("k",
        when(col("user_id") % 3 === 0, lit(0L))
          .otherwise(col("user_id")).cast("long"))
    val dim = ev.select(col("k")).distinct()
      .withColumn("label", concat(lit("seg_"), col("k")))
    graft.operators.Operators.skewAwareJoin(ev, dim, Seq("k"))
      .groupBy("k", "label").agg(count(lit(1)).as("n_rows"))
      .orderBy("k")
  }

  val q170_sql: String =
    """WITH ev AS (SELECT CAST(CASE WHEN user_id % 3 = 0 THEN 0 ELSE user_id END
      |                        AS BIGINT) AS k FROM events),
      |d AS (SELECT DISTINCT k, 'seg_' || CAST(k AS VARCHAR) AS label FROM ev)
      |SELECT ev.k, d.label, CAST(count(*) AS BIGINT) AS n_rows
      |FROM ev JOIN d ON ev.k = d.k
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- q165
  // Equi-depth histogram of l_extendedprice (10 buckets) — the
  // optimizer-stats histogram. The oracle uses a plain global ntile
  // window; the Spark side deliberately does NOT: it value-compresses,
  // assigns rank intervals by the distributed prefix sum, and
  // intersects with broadcast ntile boundaries — identical output
  // (per-bucket count/min/max are tie-invariant), no single-partition
  // window anywhere.
  val q165_equidepth_hist: Q = (s, dir) =>
    graft.analytics.Stats.equiDepthHistogram(
      Tables.load(s, dir, "lineitem"), col("l_extendedprice"), 10)

  val q165_sql: String =
    """WITH r AS (SELECT l_extendedprice AS v,
      |             ntile(10) OVER (ORDER BY l_extendedprice) AS b
      |           FROM lineitem)
      |SELECT CAST(b - 1 AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(min(v) AS DOUBLE) AS min_val, CAST(max(v) AS DOUBLE) AS max_val
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- q201
  // Incremental rollup maintenance (materialized-view merge): the
  // daily-aggregate table is maintained by merging the stored rollup
  // with the new batch's partial rollup — count/sum/min/max all merge
  // by re-aggregation, so history is NEVER rescanned. The oracle
  // recomputes the rollup from ALL events in one shot; hash equality
  // proves merge ≡ recompute — the algebraic property that makes the
  // 100 TB deployment O(batch), not O(history), per ingest. (The same
  // discipline ships for sketches: the q43/q147 HLL and count-min
  // rollups merge the same way.) Values micronize to BIGINT before any
  // sum, so the merged aggregate is order-free exact.
  val q201_rollup_merge: Q = (s, dir) => {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        (col("event_id") % 13 === 0).as("is_delta"),
        expr("CAST(round(value * 1000000) AS BIGINT)").as("vm"))
    def partial(df: DataFrame) = df.groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), sum("vm").as("s"),
        min("vm").as("mn"), max("vm").as("mx"))
    val stored = partial(ev.filter(!col("is_delta"))) // the maintained table
    val batch = partial(ev.filter(col("is_delta")))   // the new ingest
    stored.unionByName(batch)
      .groupBy("event_type", "day")
      .agg(sum("n").as("n_events"), sum("s").as("sum_value_micro"),
        min("mn").as("min_value_micro"), max("mx").as("max_value_micro"))
      .orderBy("event_type", "day")
  }

  val q201_sql: String =
    """SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
      |    AS sum_value_micro,
      |  CAST(min(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
      |    AS min_value_micro,
      |  CAST(max(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
      |    AS max_value_micro
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Map[String, Q] = Map(
    "q201_rollup_merge" -> q201_rollup_merge,
    "q158_key_skew" -> q158_key_skew,
    "q170_skew_aware_join" -> q170_skew_aware_join,
    "q165_equidepth_hist" -> q165_equidepth_hist,
    "q91_right_join" -> q91_right_join,
    "q90_outlier_census" -> q90_outlier_census,
    "q87_label_centroids" -> q87_label_centroids,
    "q86_profile" -> q86_profile,
    "q85_snapshot_diff" -> q85_snapshot_diff,
    "q83_mad" -> q83_mad,
    "q84_resample" -> q84_resample,
    "q82_weighted_sample" -> q82_weighted_sample,
    "q79_unpivot" -> q79_unpivot,
    "q80_deterministic_sample" -> q80_deterministic_sample,
    "q75_regression_aggs" -> q75_regression_aggs,
    "q74_union_by_name" -> q74_union_by_name,
    "q73_group_topk" -> q73_group_topk,
    "q68_window_suite" -> q68_window_suite,
    "q69_moving_avg" -> q69_moving_avg,
    "q70_arg_minmax" -> q70_arg_minmax,
    "q71_like_rlike" -> q71_like_rlike,
    "q72_structs" -> q72_structs,
    "q53_ngram_jaccard" -> q53_ngram_jaccard,
    "q54_left_join" -> q54_left_join,
    "q55_full_outer" -> q55_full_outer,
    "q56_exists_subquery" -> q56_exists_subquery,
    "q57_posexplode" -> q57_posexplode,
    "q58_string_funcs" -> q58_string_funcs,
    "q59_date_funcs" -> q59_date_funcs,
    "q60_array_funcs" -> q60_array_funcs,
    "q61_grouping_sets" -> q61_grouping_sets,
    "q62_range_join" -> q62_range_join,
    "q63_salted_join" -> q63_salted_join,
    "q64_group_quantiles" -> q64_group_quantiles,
    "q228_iqr_census_by" -> q228_iqr_census_by,
    "q233_partkey_quantiles" -> q233_partkey_quantiles,
    "q65_conditional_agg" -> q65_conditional_agg,
    "q66_dedup_first" -> q66_dedup_first,
    "q67_json_extract" -> q67_json_extract)

  val oracle: Map[String, String] = Map(
    "q201_rollup_merge" -> q201_sql,
    "q158_key_skew" -> q158_sql,
    "q170_skew_aware_join" -> q170_sql,
    "q165_equidepth_hist" -> q165_sql,
    "q91_right_join" -> q91_sql,
    "q90_outlier_census" -> q90_sql,
    "q87_label_centroids" -> q87_sql,
    "q86_profile" -> q86_sql,
    "q85_snapshot_diff" -> q85_sql,
    "q83_mad" -> q83_sql,
    "q84_resample" -> q84_sql,
    "q82_weighted_sample" -> q82_sql,
    "q79_unpivot" -> q79_sql,
    "q80_deterministic_sample" -> q80_sql,
    "q75_regression_aggs" -> q75_sql,
    "q74_union_by_name" -> q74_sql,
    "q73_group_topk" -> q73_sql,
    "q68_window_suite" -> q68_sql,
    "q69_moving_avg" -> q69_sql,
    "q70_arg_minmax" -> q70_sql,
    "q71_like_rlike" -> q71_sql,
    "q72_structs" -> q72_sql,
    "q53_ngram_jaccard" -> q53_sql,
    "q54_left_join" -> q54_sql,
    "q55_full_outer" -> q55_sql,
    "q56_exists_subquery" -> q56_sql,
    "q57_posexplode" -> q57_sql,
    "q58_string_funcs" -> q58_sql,
    "q59_date_funcs" -> q59_sql,
    "q60_array_funcs" -> q60_sql,
    "q61_grouping_sets" -> q61_sql,
    "q62_range_join" -> q62_sql,
    "q63_salted_join" -> q63_sql,
    "q64_group_quantiles" -> q64_sql,
    "q228_iqr_census_by" -> q228_sql,
    "q233_partkey_quantiles" -> q233_sql,
    "q65_conditional_agg" -> q65_sql,
    "q66_dedup_first" -> q66_sql,
    "q67_json_extract" -> q67_sql)
}

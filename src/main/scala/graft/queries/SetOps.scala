package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Set operations, grouping sets and the SQL front end (SURVEY §2.7 +
  * extension surface). */
object SetOps {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q39
  // INTERSECT (distinct row-level set intersection).
  val q39_intersect: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    c.filter(col("c_nationkey") <= 5).select("c_mktsegment")
      .intersect(c.filter(col("c_nationkey") > 5).select("c_mktsegment"))
      .orderBy("c_mktsegment")
  }

  val q39_sql: String =
    """SELECT c_mktsegment FROM customer WHERE c_nationkey <= 5
      |INTERSECT
      |SELECT c_mktsegment FROM customer WHERE c_nationkey > 5
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q40
  // EXCEPT (distinct set difference): nations where every supplier
  // holds a balance ≥ 2000.
  val q40_except: Q = (s, dir) => {
    val sup = Tables.load(s, dir, "supplier")
    sup.select("s_nationkey")
      .except(sup.filter(col("s_acctbal") < 2000.0).select("s_nationkey"))
      .orderBy("s_nationkey")
  }

  val q40_sql: String =
    """SELECT s_nationkey FROM supplier
      |EXCEPT
      |SELECT s_nationkey FROM supplier WHERE s_acctbal < 2000.0
      |ORDER BY s_nationkey""".stripMargin

  // ---------------------------------------------------------------- q41
  // CUBE over (region, segment): all 4 grouping-set combinations.
  val q41_cube: Q = (s, dir) => {
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .cube(col("r_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy(col("r_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
  }

  val q41_sql: String =
    """SELECT r_name, c_mktsegment, count(*) AS n_cust
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY CUBE (r_name, c_mktsegment)
      |ORDER BY r_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q42
  // The engine's SQL front end: correlated IN-subquery planned by
  // Catalyst (rewritten to a semi join) — identical SQL text on both
  // engines.
  val q42_sql_frontend: Q = (s, dir) => {
    Tables.names.foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
    s.sql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |  AND o_totalprice > 350000.0
        |ORDER BY o_orderkey""".stripMargin)
  }

  val q42_sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_mktsegment = 'BUILDING')
      |  AND o_totalprice > 350000.0
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q43
  // Scale-path cardinality estimation: KMV (k-minimum-values) sketch
  // estimate vs exact distinct. KMV keeps the k smallest values of a
  // uniform hash of the key; estimate = (k−1)·2³² / u_k. Unlike HLL
  // (engine-specific register layouts — never oracle-hash those), the
  // KMV sketch is a deterministic function of the data given a shared
  // hash, so DuckDB reproduces it bit-for-bit from the same md5-derived
  // 32-bit hash. Distributed shape: hash+distinct is one shuffle, the
  // k-smallest is a TakeOrderedAndProject (per-partition top-k, no
  // global sort). HLL itself stays exercised in SetOpsSpec.
  private val KmvK = 64
  val q43_approx_distinct: Q = (s, dir) => {
    val li = Tables.load(s, dir, "lineitem")
    val kth = li
      .select(conv(substring(md5(col("l_partkey").cast("string")), 1, 8), 16, 10)
        .cast("long").as("u"))
      .distinct()
      .orderBy("u").limit(KmvK)
      .agg(max(col("u")).as("uk"))
    val exact = li.agg(countDistinct(col("l_partkey")).as("exact_parts"))
    exact.crossJoin(broadcast(kth))
      .select(col("exact_parts"),
        round(lit((KmvK - 1).toDouble) * lit(4294967296.0) / col("uk"), 6)
          .as("kmv_parts"))
  }

  val q43_sql: String =
    s"""WITH h AS (SELECT DISTINCT
       |    CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8) AS BIGINT) AS u
       |  FROM lineitem),
       |k AS (SELECT max(u) AS uk FROM (SELECT u FROM h ORDER BY u LIMIT $KmvK)),
       |e AS (SELECT count(DISTINCT l_partkey) AS exact_parts FROM lineitem)
       |SELECT exact_parts,
       |  round(${KmvK - 1}.0 * 4294967296.0 / uk, 6) AS kmv_parts
       |FROM e, k""".stripMargin

  // --------------------------------------------------------------- q147
  // Count-min sketch point queries: build a 4×32 CMS over the token
  // stream, then estimate the top-20 tokens and report each one's
  // one-sided overestimate vs the exact count (width 32 under a
  // ~31-type vocabulary forces collisions, so the error column is
  // non-trivial). The sketch itself is depth·width cells from ONE
  // map-side-combined pass — the mergeable rollup complement to q43's
  // KMV cardinality sketch. md5-derived row hashes replay in DuckDB.
  private val CmsDepth = 4
  private val CmsWidth = 32

  val q147_count_min: Q = (s, dir) => {
    val toks = Tables.load(s, dir, "documents")
      .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("token"))
    val top = toks.groupBy("token").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("token").asc).limit(20)
    val sk = graft.sketch.CountMin.sketch(toks, col("token"), CmsDepth, CmsWidth)
    graft.sketch.CountMin.estimate(sk, top, col("token"), CmsDepth, CmsWidth)
      .select(col("token"), col("exact_n"), col("cms_n"),
        (col("cms_n") - col("exact_n")).as("overestimate"))
      .orderBy(col("exact_n").desc, col("token").asc)
  }

  val q147_sql: String = {
    val h = (pfx: String) =>
      s"CAST('0x' || substr(md5(CAST($pfx.i AS VARCHAR) || ':' || token), 1, 8) AS BIGINT) % $CmsWidth"
    s"""WITH t AS (SELECT UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS token
       |           FROM documents),
       |rows_i AS (SELECT UNNEST(generate_series(0, ${CmsDepth - 1})) AS i),
       |cells AS (SELECT ri.i, ${h("ri")} AS bucket, count(*) AS c
       |          FROM t CROSS JOIN rows_i ri GROUP BY 1, 2),
       |top AS (SELECT token, count(*) AS exact_n FROM t GROUP BY token
       |        ORDER BY exact_n DESC, token LIMIT 20),
       |est AS (SELECT top.token, top.exact_n, min(cells.c) AS cms_n
       |        FROM top CROSS JOIN rows_i ii
       |        JOIN cells ON cells.i = ii.i AND cells.bucket = ${h("ii")}
       |        GROUP BY 1, 2)
       |SELECT token, CAST(exact_n AS BIGINT) AS exact_n,
       |  CAST(cms_n AS BIGINT) AS cms_n,
       |  CAST(cms_n - exact_n AS BIGINT) AS overestimate
       |FROM est ORDER BY exact_n DESC, token""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q39_intersect" -> q39_intersect,
    "q40_except" -> q40_except,
    "q41_cube" -> q41_cube,
    "q42_sql_frontend" -> q42_sql_frontend,
    "q43_approx_distinct" -> q43_approx_distinct,
    "q147_count_min" -> q147_count_min)

  val oracle: Map[String, String] = Map(
    "q39_intersect" -> q39_sql,
    "q40_except" -> q40_sql,
    "q41_cube" -> q41_sql,
    "q42_sql_frontend" -> q42_sql,
    "q43_approx_distinct" -> q43_sql,
    "q147_count_min" -> q147_sql)
}

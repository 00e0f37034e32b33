package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream shaping: sessionization and pivot — the classic
  * clickstream operators at warehouse scale. One shuffle on user_id
  * serves both windows in q37; the pivot is a single groupBy with
  * conditional counts fanned into columns.
  */
object Sessions {

  type Q = (SparkSession, String) => DataFrame

  /** Gap-based sessionization (30-min inactivity boundary): lag →
    * session-start flags → running sum = session id → per-session
    * aggregates. Integer second arithmetic end-to-end so both engines
    * agree exactly. */
  val q37_sessionize: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gap = unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w))
    val isStart = when(gap.isNull || gap > 1800, 1).otherwise(0)
    val sessions = e
      .withColumn("session_id",
        sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("duration_s"))
      .orderBy("user_id", "session_id")
    sessions
  }

  val q37_sql: String =
    """WITH x AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR date_diff('second', lag(ts) OVER w, ts) > 1800
      |         THEN 1 ELSE 0 END AS is_start
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |), sess AS (
      |  SELECT user_id, ts,
      |    CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS BIGINT) AS session_id
      |  FROM x)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  date_diff('second', min(ts), max(ts)) AS duration_s
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: daily event counts fanned into one column per event type
    * (explicit value list — never let pivot scan for distinct values at
    * scale). */
  val q38_pivot: Q = (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0, EventTypes)
      .orderBy("day")

  val q38_sql: String = {
    val cols = EventTypes.map(t =>
      s"count(CASE WHEN event_type = '$t' THEN 1 END) AS $t").mkString(",\n  ")
    s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       |  $cols
       |FROM events GROUP BY day ORDER BY day""".stripMargin
  }

  // ---------------------------------------------------------------- q44
  // As-of (point-in-time) join: for every click, the user's latest
  // purchase at-or-before it (graft.operators.Operators.asofJoin — one
  // key shuffle via tag+union+window; DuckDB's native ASOF JOIN is the
  // oracle).
  val q44_asof_join: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
    graft.operators.Operators
      .asofJoin(clicks, purchases, Seq("user_id"), "ts", Seq("purchase_value"))
      .select(
        col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        date_format(col("__asof_time"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("purchase_value"))
      .orderBy("user_id", "event_id")
  }

  val q44_sql: String =
    """WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts, value AS purchase_value FROM events
      |      WHERE event_type = 'purchase')
      |SELECT c.user_id, c.event_id,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  p.purchase_value
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
      |ORDER BY c.user_id, c.event_id""".stripMargin

  // ---------------------------------------------------------------- q51
  // Ordered funnel: signup → first click after signup → first purchase
  // after that click; per-step user counts. Each step is a min-
  // aggregate over a time-constrained join — no window re-sorts.
  val q51_funnel: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
    def step(t: String) = e.filter(col("event_type") === t)
      .select(col("user_id"), col("ts"))
    val s1 = step("signup").groupBy("user_id").agg(min(col("ts")).as("t1"))
    val s2 = step("click").join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val s3 = step("purchase").join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    s1.agg(count(lit(1)).as("n_signup"))
      .crossJoin(s2.agg(count(lit(1)).as("n_click_after")))
      .crossJoin(s3.agg(count(lit(1)).as("n_purchase_after")))
  }

  val q51_sql: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
      |       WHERE e.event_type = 'click' GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
      |       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      |SELECT (SELECT count(*) FROM s1) AS n_signup,
      |       (SELECT count(*) FROM s2) AS n_click_after,
      |       (SELECT count(*) FROM s3) AS n_purchase_after""".stripMargin

  // ---------------------------------------------------------------- q52
  // Cohort retention: users grouped by first-seen day; distinct active
  // users at day offsets 0..7. One shuffle keyed by user for the
  // cohort, one for the (cohort, offset) rollup.
  val q52_retention: Q = (s, dir) => {
    val e = Tables.load(s, dir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    val cohorts = e.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    e.join(broadcast(cohorts), Seq("user_id"))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("day_offset") <= 7)
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  val q52_sql: String =
    """WITH e AS (SELECT user_id, date_trunc('day', ts) AS day FROM events),
      |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
      |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
      |  date_diff('day', cohort_day, day) AS day_offset,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM e JOIN c ON e.user_id = c.user_id
      |WHERE date_diff('day', cohort_day, day) <= 7
      |GROUP BY cohort, day_offset ORDER BY cohort, day_offset""".stripMargin

  val all: Map[String, Q] = Map(
    "q37_sessionize" -> q37_sessionize,
    "q38_pivot" -> q38_pivot,
    "q44_asof_join" -> q44_asof_join,
    "q51_funnel" -> q51_funnel,
    "q52_retention" -> q52_retention)

  val oracle: Map[String, String] = Map(
    "q37_sessionize" -> q37_sql,
    "q38_pivot" -> q38_sql,
    "q44_asof_join" -> q44_sql,
    "q51_funnel" -> q51_sql,
    "q52_retention" -> q52_sql)
}

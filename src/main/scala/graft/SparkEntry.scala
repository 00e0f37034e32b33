package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2) expressed over the
  * star-schema testdata; `oracleSql` holds the DuckDB-equivalent SQL the
  * driver hash-compares against on sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.all ++
      graft.queries.Analytic.all ++
      graft.queries.TextSim.all ++
      graft.queries.Sessions.all ++
      graft.queries.SetOps.all ++
      graft.queries.CorpusQueries.all ++
      graft.queries.Extended.all ++
      graft.queries.Media.all ++
      graft.queries.Governance.all ++
      graft.queries.Curation.all ++
      graft.queries.Mining.all ++
      graft.queries.Integrity.all

  /** Queries selected by the optional comma-separated name filter
    * (`SPARK_GRAFT_ONLY` in Verify/Bench). Unknown names are an ERROR —
    * a typo must not produce a silently-empty artifact that looks like
    * a valid run. `None` (the driver) gets the full map. */
  def selected(only: Option[String]): Map[String, (SparkSession, String) => DataFrame] =
    only.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet) match {
      case None => queries
      case Some(names) =>
        val unknown = names.diff(queries.keySet)
        require(unknown.isEmpty,
          s"unknown query names in filter: ${unknown.toSeq.sorted.mkString(", ")}")
        queries.view.filterKeys(names).toMap
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    *
    * Every registered query has an oracle entry. (The float/xxhash IVF
    * fast trainer, whose k-means centroids depend on shuffle-merge
    * order and so can't be replayed in ANSI SQL, is pinned spec-only
    * by IvfSpec; since round 8 `q48_ann_ivf` runs the checked trainer
    * at the tuner-chosen probe depth and hash-matches.)
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Analytic.oracle ++
      graft.queries.TextSim.oracle ++
      graft.queries.Sessions.oracle ++
      graft.queries.SetOps.oracle ++
      graft.queries.CorpusQueries.oracle ++
      graft.queries.Extended.oracle ++
      graft.queries.Media.oracle ++
      graft.queries.Governance.oracle ++
      graft.queries.Curation.oracle ++
      graft.queries.Mining.oracle ++
      graft.queries.Integrity.oracle
}

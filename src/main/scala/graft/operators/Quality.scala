package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audits over relational constraints — the dbt-test /
  * DQ-framework layer expressed as Spark plans: referential integrity
  * (FK orphans), uniqueness, and non-null checks, each one census row
  * per constraint instead of a pass/fail boolean, so violations are
  * countable and trendable across snapshot versions.
  *
  * 100 TB shape: every check is one anti-join or one aggregate on the
  * constraint's key — the orphan check shuffles child keys against
  * the (usually broadcastable) parent key set; nothing is ever
  * driver-resident, and each census row is independent (checks run in
  * one union'd job, sharing scans where the optimizer can). */
object Quality {

  /** One referential-integrity census row: child/parent table names,
    * child row count, DISTINCT child keys, and orphan rows (child rows
    * whose non-null FK has no matching parent key). Null FKs are not
    * orphans — they are counted separately (a null FK is a modeling
    * choice; a dangling one is corruption). */
  def fkAudit(child: DataFrame, childName: String, fk: Column,
              parent: DataFrame, parentName: String, pk: Column): DataFrame = {
    val keys = parent.select(pk.as("__pk")).distinct()
    val c = child.select(fk.as("__fk"))
    val orphans = c.filter(col("__fk").isNotNull)
      .join(keys, col("__fk") === col("__pk"), "left_anti")
    val base = c.agg(count(lit(1)).as("n_rows"),
      count(col("__fk")).as("n_nonnull"),
      countDistinct(col("__fk")).as("n_distinct"))
    base.crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_orphans"))))
      .select(lit(s"$childName.$parentName").as("edge"),
        col("n_rows"), (col("n_rows") - col("n_nonnull")).as("n_null_fk"),
        col("n_distinct"), col("n_orphans"))
  }

  /** Union of per-edge audits — the whole-schema census. */
  def fkAuditAll(edges: Seq[DataFrame]): DataFrame =
    edges.reduce(_ unionAll _)

  /** One uniqueness census row per declared key: total rows, distinct
    * key values, surplus rows (rows beyond one per key — 0 means the
    * key IS unique), and the hottest key's multiplicity. One map-side-
    * combined aggregate per table; the census is what a dbt `unique`
    * test reports as a boolean, kept countable so regressions trend. */
  def uniqueAudit(df: DataFrame, table: String, keyCols: Seq[Column]): DataFrame =
    df.groupBy(keyCols: _*).agg(count(lit(1)).as("__c"))
      .agg(sum("__c").as("n_rows"), count(lit(1)).as("n_keys"),
        max("__c").as("max_dup"))
      .select(lit(table).as("table_key"),
        col("n_rows"), col("n_keys"),
        (col("n_rows") - col("n_keys")).as("n_surplus"), col("max_dup"))

  def uniqueAuditAll(audits: Seq[DataFrame]): DataFrame =
    audits.reduce(_ unionAll _)
}

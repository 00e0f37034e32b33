package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audits over relational constraints — the dbt-test /
  * DQ-framework layer expressed as Spark plans: referential integrity
  * (FK orphans) and uniqueness, each one census row per constraint
  * instead of a pass/fail boolean, so violations are countable and
  * trendable across snapshot versions.
  *
  * 100 TB shape: each check is ONE pass over the audited table — the
  * orphan check is a single left join against the (usually
  * broadcastable) parent key set feeding one aggregate; uniqueness is
  * one map-side-combined key aggregate. Nothing is driver-resident. */
object Quality {

  /** One referential-integrity census row: `child.fk->parent` edge
    * label (the FK column is part of the label — two FKs to the same
    * parent stay distinguishable), child row count, null FKs, DISTINCT
    * child keys, and orphan rows (non-null FK with no matching parent
    * key). Null FKs are not orphans — a null FK is a modeling choice,
    * a dangling one is corruption.
    *
    * Single pass: the child scans once into a left join against the
    * DISTINCT parent key set (distinct is load-bearing for this plan
    * shape: a duplicated parent key would multiply child rows and
    * corrupt every count — the audit must not assume the PK it audits
    * is intact), then one aggregate computes every census column. */
  def fkAudit(child: DataFrame, childName: String, fk: Column,
              parent: DataFrame, parentName: String, pk: Column): DataFrame = {
    val fkName = fk.toString
    val keys = parent.select(pk.as("__pk")).distinct()
    child.select(fk.as("__fk"))
      .join(keys, col("__fk") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        count(lit(1)).minus(count(col("__fk"))).as("n_null_fk"),
        countDistinct(col("__fk")).as("n_distinct"),
        count(when(col("__fk").isNotNull && col("__pk").isNull, lit(1)))
          .as("n_orphans"))
      .select(lit(s"$childName.$fkName->$parentName").as("edge"),
        col("n_rows"), col("n_null_fk"), col("n_distinct"), col("n_orphans"))
  }

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

  /** Union of census rows — the whole-schema audit as one job. */
  def auditUnion(audits: Seq[DataFrame]): DataFrame =
    audits.reduce(_ unionAll _)
}

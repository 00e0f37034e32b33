package graft.streaming

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent keyed upsert sinks (SURVEY §2.1 S5 / §2.3 J1 / §2.9 T4).
  *
  * The reference's exactly-once story is at-least-once Kafka delivery +
  * an idempotent `INSERT … ON CONFLICT (key) DO UPDATE` into Postgres
  * (`consumer.py:94-106`). Structured Streaming gives at-least-once
  * into `foreachBatch`; the idempotent merge completes exactly-once.
  *
  * Two implementations:
  *  - [[JdbcUpsert]] — the reference-shaped sink: batched ON CONFLICT
  *    statements per partition (parallel connections = partitions,
  *    batch size bounds round trips).
  *  - [[ParquetMergeSink]] — warehouse-less merge for environments with
  *    no JDBC endpoint (and the unit-testable path here): read current
  *    table, anti-join conflict resolution preferring the new batch,
  *    atomic rewrite. Semantically Delta/Iceberg `MERGE INTO`.
  */
object UpsertSink {

  /** Build the reference's upsert statement (`consumer.py:94-106`). */
  def onConflictSql(table: String, cols: Seq[String], keyCols: Seq[String]): String = {
    val collist = cols.map(c => s""""$c"""").mkString(", ")
    val params = cols.map(_ => "?").mkString(", ")
    val keys = keyCols.map(c => s""""$c"""").mkString(", ")
    val updates = cols.filterNot(keyCols.contains)
      .map(c => s""""$c" = EXCLUDED."$c"""").mkString(", ")
    s"""INSERT INTO "$table" ($collist) VALUES ($params)
       |ON CONFLICT ($keys) DO UPDATE SET $updates""".stripMargin
  }

  /** DDL-on-start (`consumer.py:77-92`): unique key backs the upsert. */
  def createTableSql(table: String, colDdl: Seq[(String, String)],
                     keyCols: Seq[String]): String = {
    val cols = colDdl.map { case (n, t) => s""""$n" $t""" }.mkString(", ")
    val uniq = keyCols.map(c => s""""$c"""").mkString(", ")
    s"""CREATE TABLE IF NOT EXISTS "$table" ($cols, UNIQUE ($uniq))"""
  }

  /** Upsert statement strategy per warehouse engine. The reference
    * targets Postgres (`ON CONFLICT`); [[Dialect.UpdateInsert]] is the
    * ANSI-92 fallback (UPDATE by key, INSERT when nothing matched — the
    * same idempotent merge in one transaction) that embedded engines
    * like Derby execute, which is how the sink is integration-tested
    * here without a Postgres endpoint. */
  sealed trait Dialect extends Serializable
  object Dialect {
    /** Postgres `INSERT … ON CONFLICT DO UPDATE` (reference shape). */
    case object OnConflict extends Dialect
    /** Portable UPDATE-else-INSERT (Derby/H2/any ANSI engine). */
    case object UpdateInsert extends Dialect
  }

  /** ANSI fallback statements: (UPDATE set non-keys WHERE keys,
    * INSERT all). Parameter order: UPDATE takes non-key columns then
    * key columns; INSERT takes all columns in `cols` order. */
  def updateInsertSql(table: String, cols: Seq[String],
                      keyCols: Seq[String]): (String, String) = {
    val nonKeys = cols.filterNot(keyCols.contains)
    val sets = nonKeys.map(c => s""""$c" = ?""").mkString(", ")
    val where = keyCols.map(c => s""""$c" = ?""").mkString(" AND ")
    val collist = cols.map(c => s""""$c"""").mkString(", ")
    val params = cols.map(_ => "?").mkString(", ")
    (s"""UPDATE "$table" SET $sets WHERE $where""",
      s"""INSERT INTO "$table" ($collist) VALUES ($params)""")
  }

  object JdbcUpsert {
    /** foreachBatch body: executors open their own connections and
      * upsert their partitions in `batchSize` chunks. Use a small fixed
      * partition count to bound warehouse connections (the reference
      * uses exactly 1; `consumer.py:182` pages at 100).
      *
      * Rows with the same key must land in the same partition when
      * running concurrent connections against a non-ON CONFLICT engine
      * (otherwise two UPDATE-miss/INSERT races can collide on the
      * unique key) — so the [[Dialect.UpdateInsert]] path hash-partitions
      * by `keyCols` instead of coalescing, which both co-locates keys and
      * bounds connections. ON CONFLICT is key-atomic server-side, so a
      * plain coalesce suffices there. */
    def upsertBatch(df: DataFrame, url: String, table: String,
                    keyCols: Seq[String], batchSize: Int = 100,
                    numConnections: Int = 4,
                    dialect: Dialect = Dialect.OnConflict): Unit = {
      val cols = df.columns.toSeq
      dialect match {
        case Dialect.OnConflict =>
          val sql = onConflictSql(table, cols, keyCols)
          df.coalesce(numConnections).foreachPartition { rows: Iterator[Row] =>
            if (rows.nonEmpty) {
              val conn: Connection = DriverManager.getConnection(url)
              try {
                conn.setAutoCommit(false)
                val ps = conn.prepareStatement(sql)
                var pending = 0
                rows.foreach { r =>
                  cols.indices.foreach(i => ps.setObject(i + 1, r.get(i)))
                  ps.addBatch(); pending += 1
                  if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
                }
                if (pending > 0) ps.executeBatch()
                conn.commit()
              } finally conn.close()
            }
          }
        case Dialect.UpdateInsert =>
          val (upSql, insSql) = updateInsertSql(table, cols, keyCols)
          val nonKeyIdx = cols.filterNot(keyCols.contains).map(cols.indexOf).toArray
          val keyIdx = keyCols.map(cols.indexOf).toArray
          // repartition (not coalesce): same key -> same connection, no
          // cross-partition UPDATE-miss/INSERT race on the unique index.
          val keyed =
            if (numConnections > 1) df.repartition(numConnections, keyCols.map(col): _*)
            else df.coalesce(1)
          keyed.foreachPartition { rows: Iterator[Row] =>
            if (rows.nonEmpty) {
              val conn: Connection = DriverManager.getConnection(url)
              try {
                conn.setAutoCommit(false)
                val up = conn.prepareStatement(upSql)
                val ins = conn.prepareStatement(insSql)
                var pending = 0
                rows.foreach { r =>
                  nonKeyIdx.zipWithIndex.foreach { case (ci, pi) =>
                    up.setObject(pi + 1, r.get(ci)) }
                  keyIdx.zipWithIndex.foreach { case (ci, pi) =>
                    up.setObject(nonKeyIdx.length + pi + 1, r.get(ci)) }
                  if (up.executeUpdate() == 0) {
                    cols.indices.foreach(i => ins.setObject(i + 1, r.get(i)))
                    ins.executeUpdate(): Unit
                  }
                  pending += 1
                  if (pending >= batchSize) { conn.commit(); pending = 0 }
                }
                conn.commit()
              } finally conn.close()
            }
          }
      }
    }
  }

  object ParquetMergeSink {
    import org.apache.hadoop.fs.{FileSystem, Path}

    /** MERGE INTO for a keyed parquet table: new batch rows win on key
      * conflict (within-batch duplicates resolved deterministically by
      * highest `version` order column first). Rewrite is
      * write-temp-then-swap so readers never see a half table.
      *
      * All path handling goes through the Hadoop [[FileSystem]] resolved
      * from the table path's own scheme — the sink works unchanged on
      * `file://`, `hdfs://` and `s3a://` URIs. On HDFS the two renames
      * are atomic metadata ops; on S3A a rename is copy+delete, so the
      * swap window is not atomic there — production S3 deployments
      * should prefer the [[JdbcUpsert]] path or a table format with
      * commit protocols (the semantics here mirror Delta/Iceberg
      * `MERGE INTO`). */
    def merge(batch: DataFrame, tablePath: String, keyCols: Seq[String],
              orderCol: Option[String] = None): Unit = {
      val spark = batch.sparkSession
      val dedupWindow = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(orderCol.map(c => col(c).desc).getOrElse(monotonically_increasing_id().desc))
      val newRows = batch
        .withColumn("__rn", row_number().over(dedupWindow))
        .filter(col("__rn") === 1).drop("__rn")
      val target = new Path(tablePath)
      val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val merged =
        if (fs.exists(target)) {
          val current = spark.read.parquet(tablePath)
          current.join(newRows, keyCols, "left_anti").unionByName(newRows)
        } else newRows
      val tmp = new Path(tablePath + "__tmp")
      merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      if (fs.exists(target)) {
        val old = new Path(tablePath + "__old")
        if (fs.exists(old)) fs.delete(old, true)
        renameOrThrow(fs, target, old)
        try renameOrThrow(fs, tmp, target)
        catch { case e: java.io.IOException =>
          // Roll the backup straight back so readers still have a table.
          fs.rename(old, target)
          throw e
        }
        if (fs.exists(target)) fs.delete(old, true)
      } else renameOrThrow(fs, tmp, target)
      (): Unit
    }

    /** Hadoop FileSystem.rename reports most failures (missing parent,
      * existing destination, S3A partial copy, cross-FS moves) as
      * `false`, not an exception — a swap step must check the boolean
      * before deleting anything, or a half-failed swap destroys the only
      * remaining copy of the table. The backup is only removed once the
      * new target verifiably exists. */
    private[graft] def renameOrThrow(fs: FileSystem, src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"rename $src -> $dst failed; table left intact")
  }
}

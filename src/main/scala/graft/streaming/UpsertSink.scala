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

  object JdbcUpsert {
    /** foreachBatch body: executors open their own connections and
      * upsert their partitions in `batchSize` chunks. Use a small fixed
      * partition count to bound warehouse connections (the reference
      * uses exactly 1; `consumer.py:182` pages at 100). */
    def upsertBatch(df: DataFrame, url: String, table: String,
                    keyCols: Seq[String], batchSize: Int = 100,
                    numConnections: Int = 4): Unit = {
      val cols = df.columns.toSeq
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
    }
  }

  object ParquetMergeSink {
    /** MERGE INTO for a keyed parquet table: new batch rows win on key
      * conflict (within-batch duplicates resolved deterministically by
      * highest `version` order column first). Rewrite is
      * write-temp-then-swap so readers never see a half table. */
    def merge(batch: DataFrame, tablePath: String, keyCols: Seq[String],
              orderCol: Option[String] = None): Unit = {
      val spark = batch.sparkSession
      val dedupWindow = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(orderCol.map(c => col(c).desc).getOrElse(monotonically_increasing_id().desc))
      val newRows = batch
        .withColumn("__rn", row_number().over(dedupWindow))
        .filter(col("__rn") === 1).drop("__rn")
      val fs = new java.io.File(tablePath)
      val merged =
        if (fs.exists()) {
          val current = spark.read.parquet(tablePath)
          current.join(newRows, keyCols, "left_anti").unionByName(newRows)
        } else newRows
      val tmp = tablePath + "__tmp"
      merged.write.mode(SaveMode.Overwrite).parquet(tmp)
      val target = new java.io.File(tablePath)
      if (target.exists()) {
        val old = new java.io.File(tablePath + "__old")
        deleteRec(old)
        target.renameTo(old)
        new java.io.File(tmp).renameTo(target)
        deleteRec(old)
      } else new java.io.File(tmp).renameTo(target)
    }

    private def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRec)
      f.delete(): Unit
    }
  }
}

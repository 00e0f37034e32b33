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
  *    snapshot, anti-join conflict resolution preferring the new batch,
  *    versioned-directory commit (the previous version stays readable
  *    through the entire commit). Semantically Delta/Iceberg
  *    `MERGE INTO` with a snapshot pointer.
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

  /** MERGE INTO for a keyed parquet table via VERSIONED-DIRECTORY
    * commits — the scale-safe successor of a rename-swap:
    *
    * {{{
    * table/
    *   _latest        <- pointer hint ("v00000003"), best-effort O(1)
    *   v00000001/     <- immutable committed version (has _SUCCESS)
    *   v00000002/
    *   v00000003/
    * }}}
    *
    * Each merge writes a complete NEW version directory; the commit
    * point is Spark's own job-commit `_SUCCESS` marker (a single file
    * create — atomic on HDFS, and safe on S3A where rename is
    * copy+delete and the old double-rename swap had both a
    * reader-visible gap and a rollback dead end). Readers resolve the
    * highest version directory that has `_SUCCESS`: a crash mid-write
    * leaves an uncommitted directory that is simply invisible, and the
    * previous version stays readable through the entire commit. The
    * `_latest` pointer is a validated fast path only — if it is stale,
    * corrupt or missing, resolution falls back to listing.
    *
    * **Multi-writer fencing.** Version N is fenced by an EPOCH CLAIM:
    * before writing, a merge must atomically create
    * `_claims/vNNNNNNNN` with create-if-absent, and claims are only
    * ever taken for (highest committed)+1 — so every commit's basis is
    * provably its immediate predecessor and a slower writer can never
    * overwrite or leapfrog a faster one (the classic two-writers-both-
    * commit-vN+1 lost update). A loser re-resolves and retries on the
    * winner's snapshot up to `maxAttempts`, then aborts cleanly with
    * [[ConcurrentWriteException]] — the table is untouched either way.
    * A claim whose version never commits (crashed claimer) is broken
    * after `staleClaimMs` and its partial directory overwritten.
    *
    * Caveat: create-if-absent is atomic on HDFS/ABFS/GCS and the local
    * FS, but S3 has no conditional create in the Hadoop S3A connector
    * (HADOOP-17851 tracks conditional-write support) — on plain S3A,
    * fencing degrades to best-effort and a real lock service
    * (DynamoDB-backed, or a Delta/Iceberg catalog) should arbitrate
    * writers instead. Readers need no fencing in any case: committed
    * versions are immutable.
    *
    * Semantically this is Delta/Iceberg `MERGE INTO` + snapshot
    * pointer + optimistic concurrency, minus the catalog service. Old
    * versions are kept for readers-in-flight / time travel until
    * [[ParquetMergeSink.vacuum]] trims them. */
  /** A merge lost the claim race `maxAttempts` times in a row — the
    * clean abort of the fenced commit protocol. The table is intact;
    * re-running the merge later is safe and idempotent. */
  final class ConcurrentWriteException(msg: String)
    extends java.io.IOException(msg)

  object ParquetMergeSink {
    import org.apache.hadoop.fs.{FileSystem, Path}

    private val Pointer = "_latest"
    private val ClaimsDir = "_claims"
    private def dirName(v: Long) = f"v$v%08d"
    private def claimPath(root: Path, v: Long) =
      new Path(new Path(root, ClaimsDir), dirName(v))

    /** Atomic create-if-absent of the claim file. Returns false when the
      * claim is already held. On HDFS `create(path, overwrite=false)` is
      * an atomic namespace operation — but on the LOCAL filesystem
      * Hadoop's RawLocalFileSystem implements it as check-then-create
      * (a TOCTOU window two racing threads really do hit), so `file:`
      * paths go through `java.io.File.createNewFile`, which is
      * O_CREAT|O_EXCL-atomic. See the class doc for the S3A caveat. */
    private[graft] def tryClaim(fs: FileSystem, root: Path, v: Long,
                                writerId: String): Boolean = {
      val cp = claimPath(root, v)
      val payload = s"$writerId ${System.currentTimeMillis()}".getBytes("UTF-8")
      try {
        if (fs.getScheme == "file") {
          fs.mkdirs(cp.getParent)
          val local = new java.io.File(cp.toUri.getPath)
          if (!local.createNewFile()) false // atomic O_EXCL claim
          else {
            // we own the file; the payload write is just debuggability
            java.nio.file.Files.write(local.toPath, payload)
            true
          }
        } else {
          val out = fs.create(cp, false)
          try out.write(payload) finally out.close()
          true
        }
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    }

    /** Committed versions in ascending order: `vNNNNNNNN` children
      * carrying Spark's `_SUCCESS` job-commit marker. */
    private[graft] def committedVersions(fs: FileSystem, root: Path): Seq[(Long, Path)] =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d{8}"))
        .map(st => st.getPath.getName.drop(1).toLong -> st.getPath)
        .filter { case (_, p) => fs.exists(new Path(p, "_SUCCESS")) }
        .sortBy(_._1)

    /** Every version directory, committed or not (crash leftovers). */
    private def allVersions(fs: FileSystem, root: Path): Seq[(Long, Path)] =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d{8}"))
        .map(st => st.getPath.getName.drop(1).toLong -> st.getPath)
        .sortBy(_._1)

    /** Resolve the active version. The LISTING is authoritative: the
      * `_latest` hint is only consulted as a candidate alongside the
      * highest listed committed version, and the maximum of the two
      * wins. A stale hint (crash or swallowed IOException between job
      * commit and pointer flip leaves it one version behind) must never
      * roll the table back to an older snapshot — basing the next merge
      * on it would silently drop the committed-but-unhinted rows. */
    def latestVersionPath(fs: FileSystem, root: Path): Option[Path] = {
      val hinted: Option[(Long, Path)] =
        try {
          val ptr = new Path(root, Pointer)
          if (!fs.exists(ptr)) None
          else {
            val in = fs.open(ptr)
            val name =
              try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
            Some(new Path(root, name))
              .filter(p => name.matches("v\\d{8}") && fs.exists(new Path(p, "_SUCCESS")))
              .map(p => name.drop(1).toLong -> p)
          }
        } catch { case _: java.io.IOException => None }
      (hinted.toSeq ++ committedVersions(fs, root).lastOption.toSeq)
        .sortBy(_._1).lastOption.map(_._2)
    }

    /** Read the current committed snapshot. Throws when the table has no
      * committed version yet. */
    def read(spark: org.apache.spark.sql.SparkSession, tablePath: String): DataFrame = {
      val root = new Path(tablePath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val p = latestVersionPath(fs, root).getOrElse(
        throw new java.io.FileNotFoundException(
          s"no committed version under $tablePath"))
      spark.read.parquet(p.toString)
    }

    /** Committed version numbers in ascending order — the time-travel
      * index a reader picks from. */
    def listVersions(spark: org.apache.spark.sql.SparkSession,
                     tablePath: String): Seq[Long] = {
      val root = new Path(tablePath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      committedVersions(fs, root).map(_._1)
    }

    /** Time travel: read the table AS OF committed version `version`.
      * Committed versions are immutable, so this needs no coordination
      * with writers — vN−1 stays byte-stable while vN (or any later
      * version) commits. Throws when `version` was never committed (or
      * has been vacuumed). */
    def readVersion(spark: org.apache.spark.sql.SparkSession,
                    tablePath: String, version: Long): DataFrame = {
      val root = new Path(tablePath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dst = new Path(root, dirName(version))
      if (!fs.exists(new Path(dst, "_SUCCESS")))
        throw new java.io.FileNotFoundException(
          s"version ${dirName(version)} of $tablePath is not committed " +
            "(never existed, crashed mid-write, or vacuumed)")
      spark.read.parquet(dst.toString)
    }

    /** Merge a batch into the table: new batch rows win on key conflict
      * (within-batch duplicates resolved deterministically by highest
      * `orderCol` first), everything else carries over from the current
      * snapshot into a brand-new version directory.
      *
      * Fenced commit: each attempt re-resolves the latest committed
      * snapshot, claims exactly (latest+1), and only the claim holder
      * writes — a concurrent winner makes this writer recompute on the
      * NEW snapshot (no lost update), and `maxAttempts` losses abort
      * cleanly with [[ConcurrentWriteException]]. A claim older than
      * `staleClaimMs` whose version never committed is broken. */
    def merge(batch: DataFrame, tablePath: String, keyCols: Seq[String],
              orderCol: Option[String] = None,
              maxAttempts: Int = 5, claimRetryMs: Long = 200L,
              staleClaimMs: Long = 30L * 60 * 1000): Unit = {
      val spark = batch.sparkSession
      val dedupWindow = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(orderCol.map(c => col(c).desc).getOrElse(monotonically_increasing_id().desc))
      val newRows = batch
        .withColumn("__rn", row_number().over(dedupWindow))
        .filter(col("__rn") === 1).drop("__rn")
      val root = new Path(tablePath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val writerId = java.util.UUID.randomUUID().toString

      var attempt = 0
      var committed = false
      while (!committed) {
        attempt += 1
        // basis re-resolved EVERY attempt: a lost race means the next
        // try merges against the winner's snapshot, never the stale one
        val basis = committedVersions(fs, root).lastOption
        val next = basis.map(_._1 + 1).getOrElse(1L)
        if (tryClaim(fs, root, next, writerId)) {
          // allowMissingColumns = schema evolution on merge: a batch
          // that ADDS a column null-fills it for carried-over rows; a
          // batch missing a stored column null-fills it for its own
          // rows while carried-over rows keep their data. Key columns
          // always exist on both sides (the anti-join requires them).
          val merged = basis match {
            case Some((_, cur)) =>
              spark.read.parquet(cur.toString)
                .join(newRows, keyCols, "left_anti")
                .unionByName(newRows, allowMissingColumns = true)
            case None => newRows
          }
          // Overwrite also clears any partial directory a crashed
          // claimer left behind under this (re-claimed) version
          val dst = new Path(root, dirName(next))
          merged.write.mode(SaveMode.Overwrite).parquet(dst.toString)
          // job commit above dropped _SUCCESS — the table is committed;
          // the pointer flip is a best-effort hint, never load-bearing
          try {
            val tmp = new Path(root, Pointer + ".tmp")
            val out = fs.create(tmp, true)
            try out.write(dirName(next).getBytes("UTF-8")) finally out.close()
            fs.delete(new Path(root, Pointer), false)
            renameOrThrow(fs, tmp, new Path(root, Pointer))
          } catch { case _: java.io.IOException => () }
          committed = true
        } else {
          // claim held by someone else: break it if its writer is long
          // dead (claim age > staleClaimMs and the version never
          // committed), else wait-and-retry up to the attempt budget
          val cp = claimPath(root, next)
          val stale =
            try {
              fs.exists(cp) &&
                (System.currentTimeMillis() - fs.getFileStatus(cp).getModificationTime) >
                  staleClaimMs &&
                !fs.exists(new Path(new Path(root, dirName(next)), "_SUCCESS"))
            } catch { case _: java.io.IOException => false }
          if (stale) {
            fs.delete(cp, false): Unit // next attempt re-claims this slot
          } else if (attempt >= maxAttempts) {
            throw new ConcurrentWriteException(
              s"merge into $tablePath lost the claim race $maxAttempts times " +
                s"(version ${dirName(next)} held by another writer); " +
                "table unchanged — safe to retry")
          } else {
            Thread.sleep(claimRetryMs)
          }
        }
      }
    }

    /** Trim old committed versions, keeping the `keepLast` most recent
      * (plus the pointer); also clears crashed uncommitted leftovers
      * older than the newest committed version.
      *
      * `retainMs` adds a retention horizon on top: a version (committed
      * or crashed leftover) is only removable once its directory is
      * older than the horizon, so time-travel readers within the
      * retention window never lose their snapshot — the committed tail
      * (`keepLast` newest, always ≥ 1) is untouchable regardless of
      * age. `nowMs` is injectable for deterministic tests. */
    def vacuum(spark: org.apache.spark.sql.SparkSession, tablePath: String,
               keepLast: Int = 2, retainMs: Option[Long] = None,
               nowMs: () => Long = () => System.currentTimeMillis()): Unit = {
      require(keepLast >= 1, "must keep at least the current version")
      val root = new Path(tablePath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def expired(p: Path): Boolean = retainMs.forall { r =>
        try nowMs() - fs.getFileStatus(p).getModificationTime > r
        catch { case _: java.io.IOException => false }
      }
      val committed = committedVersions(fs, root)
      committed.dropRight(keepLast)
        .filter { case (_, p) => expired(p) }
        .foreach { case (_, p) => fs.delete(p, true) }
      committed.lastOption.foreach { case (latest, _) =>
        allVersions(fs, root)
          .filter { case (v, p) =>
            v < latest && !fs.exists(new Path(p, "_SUCCESS")) && expired(p) }
          .foreach { case (_, p) => fs.delete(p, true) }
        // claims below the newest committed version have served their
        // purpose (their version is immutable history now)
        val claims = new Path(root, ClaimsDir)
        if (fs.exists(claims))
          fs.listStatus(claims).toSeq
            .filter(st => st.getPath.getName.matches("v\\d{8}") &&
              st.getPath.getName.drop(1).toLong < latest)
            .foreach(st => fs.delete(st.getPath, false))
      }
    }

    /** Change data feed between two committed versions: the keyed diff
      * `fromVersion` → `toVersion` as (keyCols…, value columns,
      * change_type ∈ insert | update | delete). Inserts and updates
      * carry the TO side's values, deletes the FROM side's; rows whose
      * every value column is null-safe-equal are absent from the feed.
      * Directional — swapping the arguments yields the rollback feed.
      * Schemas are aligned by name with null-fill (the sink's
      * schema-evolution rule), so a column added between the versions
      * reports null-safe-equal for carried rows and never fabricates
      * spurious updates.
      *
      * 100 TB shape: one keyed full-outer join of the two snapshots —
      * the same shuffle class as the merge that produced them, nothing
      * driver-sized. (The merge already KNOWS its batch; this is the
      * reader-side reconstruction for when only snapshots exist —
      * downstream incremental consumers, audit, replication.) */
    def changesBetween(spark: org.apache.spark.sql.SparkSession,
                       tablePath: String, fromVersion: Long, toVersion: Long,
                       keyCols: Seq[String]): DataFrame = {
      import org.apache.spark.sql.functions._
      val a = readVersion(spark, tablePath, fromVersion)
      val b = readVersion(spark, tablePath, toVersion)
      // unified schema: TO side's columns first (target schema wins),
      // then FROM-only columns; missing columns null-fill at the
      // other side's dtype
      val unified: Seq[(String, org.apache.spark.sql.types.DataType)] =
        b.schema.fields.map(f => f.name -> f.dataType).toSeq ++
          a.schema.fields.collect {
            case f if !b.columns.contains(f.name) => f.name -> f.dataType
          }
      require(keyCols.forall(k => unified.exists(_._1 == k)),
        s"key columns $keyCols must exist in at least one version")
      def aligned(df: DataFrame) = df.select(unified.map { case (n, t) =>
        (if (df.columns.contains(n)) col(n) else lit(null).cast(t)).as(n)
      }: _*)
      val valCols = unified.map(_._1).filterNot(keyCols.contains)
      val fa = aligned(a).select(keyCols.map(col) ++
        valCols.map(c => col(c).as(s"__a_$c")) :+ lit(true).as("__in_a"): _*)
      val fb = aligned(b).select(keyCols.map(col) ++
        valCols.map(c => col(c).as(s"__b_$c")) :+ lit(true).as("__in_b"): _*)
      val changed = valCols.map(c => !(col(s"__a_$c") <=> col(s"__b_$c")))
        .reduceOption(_ || _).getOrElse(lit(false))
      fa.join(fb, keyCols, "full_outer")
        .withColumn("change_type",
          when(col("__in_a").isNull, "insert")
            .when(col("__in_b").isNull, "delete")
            .when(changed, "update"))
        .filter(col("change_type").isNotNull)
        .select(keyCols.map(col) ++ valCols.map(c =>
          when(col("change_type") === "delete", col(s"__a_$c"))
            .otherwise(col(s"__b_$c")).as(c)) :+ col("change_type"): _*)
    }

    /** Hadoop FileSystem.rename reports most failures (missing parent,
      * existing destination, S3A partial copy, cross-FS moves) as
      * `false`, not an exception — callers must check the boolean before
      * depending on the move. */
    private[graft] def renameOrThrow(fs: FileSystem, src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"rename $src -> $dst failed; table left intact")
  }
}

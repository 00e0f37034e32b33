package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.etl.{Clean, Normalize}
import graft.ml.Ols
import graft.streaming.{CountryStatsStream, ScoringPipeline, UpsertSink, Welford}

/** Streaming semantics (SURVEY §2.9, §5 test plan #5): wire-format
  * round-trip, idempotent upsert under replay (T4 exactly-once story),
  * Welford running stats ≡ two-pass batch metrics.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("wire round-trip: toWire → parseWire preserves rows; corrupt dropped") {
    val df = Seq(
      ("France", 2018, 1.3, 1.4, 0.9, 0.5, 0.2, 6.4, 1, 0),
      ("Chad", 2019, 0.3, 0.6, 0.2, 0.1, 0.05, 4.3, 0, 1))
      .toDF(ScoringPipeline.wireSchema.fieldNames: _*)
    val wire = ScoringPipeline.toWire(df)
    val back = ScoringPipeline.parseWire(wire, col("value"))
    assert(back.count() === 2)
    assert(back.columns.toSeq === ScoringPipeline.wireSchema.fieldNames.toSeq)
    val corrupt = Seq("not json at all", """{"Year": 2020}""").toDF("value")
    assert(ScoringPipeline.parseWire(corrupt, col("value")).count() === 0)
  }

  test("parquet merge upsert is idempotent and key-resolving") {
    val dir = Files.createTempDirectory("graft_upsert").toFile
    val path = s"${dir.getAbsolutePath}/t"
    val b1 = Seq(("a", 1, 10.0), ("b", 1, 20.0)).toDF("k", "y", "v")
    val b2 = Seq(("b", 1, 99.0), ("c", 1, 30.0)).toDF("k", "y", "v")
    UpsertSink.ParquetMergeSink.merge(b1, path, Seq("k", "y"))
    UpsertSink.ParquetMergeSink.merge(b2, path, Seq("k", "y"))
    UpsertSink.ParquetMergeSink.merge(b2, path, Seq("k", "y")) // replay
    val rows = UpsertSink.ParquetMergeSink.read(spark, path)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(rows.size === 3)
    assert(rows(("b", 1)) === 99.0) // new batch wins
  }

  test("versioned merge commit: old version readable through a crash window") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft_vers").toFile
    val path = s"${dir.getAbsolutePath}/t"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b1 = Seq(("a", 10.0), ("b", 20.0)).toDF("k", "v")
    val b2 = Seq(("b", 99.0)).toDF("k", "v")
    UpsertSink.ParquetMergeSink.merge(b1, path, Seq("k"))
    UpsertSink.ParquetMergeSink.merge(b2, path, Seq("k"))
    // simulate a writer that died mid-commit: a v3 directory with data
    // files but NO _SUCCESS marker must be invisible to readers
    val crashed = new Path(path, "v00000003")
    Seq(("z", -1.0)).toDF("k", "v").write.parquet(crashed.toString)
    fs.delete(new Path(crashed, "_SUCCESS"), false)
    val seen = UpsertSink.ParquetMergeSink.read(spark, path)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(seen === Map("a" -> 10.0, "b" -> 99.0), "uncommitted version leaked")
    // a stale/corrupt pointer must not be load-bearing either
    val out = fs.create(new Path(path, "_latest"), true)
    out.write("v99999999".getBytes("UTF-8")); out.close()
    assert(UpsertSink.ParquetMergeSink.read(spark, path).count() === 2)
    // the next merge overwrites the crashed leftover instead of
    // resurrecting it, and commits as the new latest
    UpsertSink.ParquetMergeSink.merge(Seq(("c", 5.0)).toDF("k", "v"), path, Seq("k"))
    val after = UpsertSink.ParquetMergeSink.read(spark, path)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(after === Map("a" -> 10.0, "b" -> 99.0, "c" -> 5.0))
    // time travel: the previous committed snapshot is still intact
    assert(spark.read.parquet(s"$path/v00000002").count() === 2)
    // vacuum keeps the latest, drops the history
    UpsertSink.ParquetMergeSink.vacuum(spark, path, keepLast = 1)
    assert(!fs.exists(new Path(path, "v00000001")))
    assert(!fs.exists(new Path(path, "v00000002")))
    assert(UpsertSink.ParquetMergeSink.read(spark, path).count() === 3)
  }

  test("time travel: readVersion pins vN-1 while vN commits; vacuumed/uncommitted throw") {
    val dir = Files.createTempDirectory("graft_tt").toFile
    val path = s"${dir.getAbsolutePath}/t"
    UpsertSink.ParquetMergeSink.merge(Seq(("a", 1.0)).toDF("k", "v"), path, Seq("k"))
    UpsertSink.ParquetMergeSink.merge(Seq(("b", 2.0)).toDF("k", "v"), path, Seq("k"))
    assert(UpsertSink.ParquetMergeSink.listVersions(spark, path) === Seq(1L, 2L))
    // pin v1, then commit v3 — the pinned snapshot must be unchanged
    val v1 = UpsertSink.ParquetMergeSink.readVersion(spark, path, 1L)
    UpsertSink.ParquetMergeSink.merge(Seq(("a", 9.0)).toDF("k", "v"), path, Seq("k"))
    assert(v1.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      === Map("a" -> 1.0))
    assert(UpsertSink.ParquetMergeSink.readVersion(spark, path, 3L)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      === Map("a" -> 9.0, "b" -> 2.0))
    intercept[java.io.FileNotFoundException] {
      UpsertSink.ParquetMergeSink.readVersion(spark, path, 4L)
    }
    UpsertSink.ParquetMergeSink.vacuum(spark, path, keepLast = 1)
    intercept[java.io.FileNotFoundException] {
      UpsertSink.ParquetMergeSink.readVersion(spark, path, 1L)
    }
  }

  test("change feed: keyed diff between versions, schema evolution, rollback direction") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cdf").toFile
    val path = s"${dir.getAbsolutePath}/t"
    val S = UpsertSink.ParquetMergeSink
    S.merge(Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("k", "v"), path, Seq("k"))
    S.merge(Seq(("b", 9.0), ("d", 4.0)).toDF("k", "v"), path, Seq("k"))
    val fwd = S.changesBetween(spark, path, 1L, 2L, Seq("k"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getString(2))).toMap
    // untouched carried rows (a, c) must be absent from the feed
    assert(fwd === Map("b" -> (9.0, "update"), "d" -> (4.0, "insert")))
    // rollback direction: the same pair reversed
    val back = S.changesBetween(spark, path, 2L, 1L, Seq("k"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(back === Map("b" -> (2.0, "update"), "d" -> (4.0, "delete")))
    // a version with an added column: carried rows null-fill and are
    // NOT spurious updates; the evolved row reports its new value
    S.merge(Seq(("a", 1.0, "x")).toDF("k", "v", "tag"), path, Seq("k"))
    val ev = S.changesBetween(spark, path, 2L, 3L, Seq("k")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), Option(r.getString(2)), r.getString(3)))
      .toMap
    assert(ev === Map("a" -> (1.0, Some("x"), "update")))
    // identical snapshots diff to an empty feed
    assert(S.changesBetween(spark, path, 3L, 3L, Seq("k")).count() === 0L)
  }

  test("vacuum retention horizon: young history survives, expired goes, tail untouchable") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft_vac").toFile
    val path = s"${dir.getAbsolutePath}/t"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1 to 3).foreach(i =>
      UpsertSink.ParquetMergeSink.merge(
        Seq((s"k$i", i.toDouble)).toDF("k", "v"), path, Seq("k")))
    // all three versions are brand new: a 1-hour horizon removes nothing
    UpsertSink.ParquetMergeSink.vacuum(spark, path, keepLast = 1,
      retainMs = Some(3600L * 1000))
    assert(UpsertSink.ParquetMergeSink.listVersions(spark, path) === Seq(1L, 2L, 3L))
    // pretend time passed the horizon: everything outside the keepLast
    // tail is now expired and goes; the committed tail stays regardless
    UpsertSink.ParquetMergeSink.vacuum(spark, path, keepLast = 1,
      retainMs = Some(3600L * 1000),
      nowMs = () => System.currentTimeMillis() + 2 * 3600L * 1000)
    assert(UpsertSink.ParquetMergeSink.listVersions(spark, path) === Seq(3L))
    assert(UpsertSink.ParquetMergeSink.read(spark, path).count() === 3)
    // an uncommitted leftover below latest: kept inside the horizon,
    // swept once expired
    val crashed = new Path(path, "v00000002")
    Seq(("z", -1.0)).toDF("k", "v").write.parquet(crashed.toString)
    fs.delete(new Path(crashed, "_SUCCESS"), false)
    UpsertSink.ParquetMergeSink.vacuum(spark, path, keepLast = 1,
      retainMs = Some(3600L * 1000))
    assert(fs.exists(crashed), "in-horizon leftover must survive")
    UpsertSink.ParquetMergeSink.vacuum(spark, path, keepLast = 1,
      retainMs = Some(3600L * 1000),
      nowMs = () => System.currentTimeMillis() + 2 * 3600L * 1000)
    assert(!fs.exists(crashed), "expired leftover must be swept")
  }

  test("schema evolution on merge: added column null-fills old rows, dropped column keeps data") {
    val dir = Files.createTempDirectory("graft_evo").toFile
    val path = s"${dir.getAbsolutePath}/t"
    UpsertSink.ParquetMergeSink.merge(
      Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"), path, Seq("k"))
    // batch ADDS column w: carried-over row 'b' null-fills it
    UpsertSink.ParquetMergeSink.merge(
      Seq(("a", 10.0, "x")).toDF("k", "v", "w"), path, Seq("k"))
    val evolved = UpsertSink.ParquetMergeSink.read(spark, path)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), Option(r.getAs[String]("w")))).toMap
    assert(evolved === Map("a" -> (10.0, Some("x")), "b" -> (2.0, None)))
    // batch MISSING column v: its own new row null-fills v, while the
    // carried-over rows keep their stored v and w
    UpsertSink.ParquetMergeSink.merge(
      Seq(("c", "y")).toDF("k", "w"), path, Seq("k"))
    val after = UpsertSink.ParquetMergeSink.read(spark, path)
      .collect().map(r => r.getString(0) ->
        (Option(r.getAs[java.lang.Double]("v")), Option(r.getAs[String]("w")))).toMap
    assert(after === Map(
      "a" -> (Some(10.0: java.lang.Double), Some("x")),
      "b" -> (Some(2.0: java.lang.Double), None),
      "c" -> (None, Some("y"))))
  }

  test("versioned merge: a STALE pointer hint cannot roll the table back") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft_stale").toFile
    val path = s"${dir.getAbsolutePath}/t"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    UpsertSink.ParquetMergeSink.merge(Seq(("a", 1.0)).toDF("k", "v"), path, Seq("k"))
    UpsertSink.ParquetMergeSink.merge(Seq(("b", 2.0)).toDF("k", "v"), path, Seq("k"))
    // simulate a swallowed pointer-flip failure: v2 committed but the
    // hint still names v1 (a VALID committed dir, so hint validation
    // alone would accept it)
    val out = fs.create(new Path(path, "_latest"), true)
    out.write("v00000001".getBytes("UTF-8")); out.close()
    // the reader must follow the listing, not the stale hint
    val seen = UpsertSink.ParquetMergeSink.read(spark, path)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(seen === Map("a" -> 1.0, "b" -> 2.0), "stale hint rolled the read back")
    // and the next merge must base on v2 — with the hint load-bearing,
    // b's committed row would vanish from v3
    UpsertSink.ParquetMergeSink.merge(Seq(("c", 3.0)).toDF("k", "v"), path, Seq("k"))
    val after = UpsertSink.ParquetMergeSink.read(spark, path)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(after === Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0),
      "stale hint dropped a committed batch")
  }

  test("versioned merge fencing: loser aborts cleanly, stale claims break") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft_fence").toFile
    val path = s"${dir.getAbsolutePath}/t"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    UpsertSink.ParquetMergeSink.merge(Seq(("a", 1.0)).toDF("k", "v"), path, Seq("k"))
    // another writer holds the claim for v2 (mid-commit): our merge
    // must NOT write v2 underneath it — bounded retries, clean abort
    assert(UpsertSink.ParquetMergeSink.tryClaim(fs, new Path(path), 2L, "other"))
    val ex = intercept[UpsertSink.ConcurrentWriteException] {
      UpsertSink.ParquetMergeSink.merge(Seq(("b", 2.0)).toDF("k", "v"), path,
        Seq("k"), maxAttempts = 2, claimRetryMs = 10L)
    }
    assert(ex.getMessage.contains("v00000002"))
    // the abort left the table untouched
    assert(UpsertSink.ParquetMergeSink.read(spark, path).count() === 1)
    assert(!fs.exists(new Path(path, "v00000002/_SUCCESS")))
    // the claimer died without committing: with the staleness horizon
    // at 0 the claim is breakable and the same merge now lands as v2
    UpsertSink.ParquetMergeSink.merge(Seq(("b", 2.0)).toDF("k", "v"), path,
      Seq("k"), maxAttempts = 3, claimRetryMs = 10L, staleClaimMs = 0L)
    val after = UpsertSink.ParquetMergeSink.read(spark, path)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(after === Map("a" -> 1.0, "b" -> 2.0))
  }

  test("versioned merge fencing: two RACING writers both land, no lost update") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = Files.createTempDirectory("graft_race").toFile
    val path = s"${dir.getAbsolutePath}/t"
    UpsertSink.ParquetMergeSink.merge(Seq(("seed", 0.0)).toDF("k", "v"), path, Seq("k"))
    val pool = Executors.newFixedThreadPool(2)
    val rounds = 3
    try {
      (1 to rounds).foreach { r =>
        val gate = new CountDownLatch(1)
        val done = new CountDownLatch(2)
        var failure: Option[Throwable] = None
        Seq("left", "right").foreach { side =>
          pool.submit(new Runnable {
            def run(): Unit = {
              gate.await()
              try UpsertSink.ParquetMergeSink.merge(
                Seq((s"$side-$r", r.toDouble)).toDF("k", "v"), path, Seq("k"),
                // generous budget: the loser spins while the winner's
                // parquet write job runs, which on a contended CI box
                // can take tens of seconds
                maxAttempts = 1200, claimRetryMs = 100L)
              catch { case t: Throwable => failure.synchronized { failure = Some(t) } }
              finally done.countDown()
            }
          })
        }
        gate.countDown()
        assert(done.await(120, TimeUnit.SECONDS), s"round $r writers hung")
        failure.foreach(t => fail(s"round $r writer failed: $t"))
      }
    } finally pool.shutdownNow()
    // EVERY racing batch must be present: a lost update would have one
    // side's key missing after its rival overwrote the same version slot
    val keys = UpsertSink.ParquetMergeSink.read(spark, path)
      .collect().map(_.getString(0)).toSet
    val expected = Set("seed") ++
      (1 to rounds).flatMap(r => Seq(s"left-$r", s"right-$r")).toSet
    assert(keys === expected, "a racing writer's batch was silently lost")
  }

  test("ON CONFLICT SQL matches the reference's upsert shape") {
    val sql = UpsertSink.onConflictSql("predictions",
      Seq("country", "year", "y_pred"), Seq("country", "year"))
    assert(sql.contains("""ON CONFLICT ("country", "year") DO UPDATE"""))
    assert(sql.contains(""""y_pred" = EXCLUDED."y_pred""""))
    assert(!sql.contains("""country" = EXCLUDED."country"""))
  }

  test("full stream: happiness wire records → score → idempotent warehouse") {
    val unified = Clean.dropNulls(
      Normalize.loadUnified(spark, TestSpark.refData), Normalize.Canonical)
    val flagged = Ols.withSplitFlags(unified, Seq("Country", "Year"))
      .withColumn("y_true", col("Happiness Score"))
    val model = Ols.fit(flagged.filter(col("is_train") === 1),
      Normalize.Features, Normalize.Target)
    val wire = ScoringPipeline.toWire(flagged).as[String].collect().toSeq

    val dir = Files.createTempDirectory("graft_stream").toFile
    val table = s"${dir.getAbsolutePath}/predictions"
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = mem.toDF().withColumnRenamed("value", "value")
      .writeStream
      .foreachBatch(ScoringPipeline.processBatch(model, table) _)
      .option("checkpointLocation", s"${dir.getAbsolutePath}/ckpt")
      .start()
    mem.addData(wire)
    q.processAllAvailable()
    mem.addData(wire) // replay every record — upsert must absorb it
    q.processAllAvailable()
    q.stop()

    val warehouse = UpsertSink.ParquetMergeSink.read(spark, table)
    assert(warehouse.count() === 781) // T4: replay-safe exactly-once
    assert(warehouse.filter(col("y_pred").isNull).count() === 0)
  }

  test("Welford running stats ≡ two-pass batch metrics") {
    val data = (1 to 100).map { i =>
      Welford.In(if (i % 2 == 0) "FR" else "TD", i.toDouble, i + (i % 7) - 3.0)
    }
    // streaming-style fold per key
    val streamed = data.groupBy(_.key).map { case (k, rows) =>
      k -> rows.foldLeft(Welford.Buf.zero)((b, r) => b.update(r.y, r.yPred))
    }
    // two-pass reference computation
    data.groupBy(_.key).foreach { case (k, rows) =>
      val n = rows.size
      val meanY = rows.map(_.y).sum / n
      val ssTot = rows.map(r => math.pow(r.y - meanY, 2)).sum
      val ssRes = rows.map(r => math.pow(r.y - r.yPred, 2)).sum
      val mae = rows.map(r => math.abs(r.y - r.yPred)).sum / n
      val buf = streamed(k)
      assert(math.abs(buf.mae.get - mae) < 1e-9)
      assert(math.abs(buf.r2.get - (1 - ssRes / ssTot)) < 1e-9)
    }
    // merge in arbitrary split points ≡ sequential (mergeability)
    val (l, r) = data.splitAt(37)
    def fold(xs: Seq[Welford.In]) =
      xs.foldLeft(Welford.Buf.zero)((b, x) => b.update(x.y, x.yPred))
    val merged = fold(l).merge(fold(r))
    val seq = fold(data)
    assert(math.abs(merged.m2 - seq.m2) < 1e-6)
    assert(merged.n === seq.n)
  }

  test("watermarked tumbling-window aggregation (event-time, append mode)") {
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = mem.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = agg.writeStream.format("memory").queryName("windowed")
      .outputMode("append").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    mem.addData((t(0), "click", 1.0), (t(1), "click", 2.0), (t(7), "view", 3.0))
    q.processAllAvailable()
    // advance event time far enough to close the first windows
    mem.addData((t(30), "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("windowed")
      .selectExpr("date_format(window.start, 'HH:mm') AS s", "event_type", "n", "v")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    q.stop()
    assert(rows.toSet === Set(("10:00", "click", 2L, 3.0), ("10:05", "view", 1L, 3.0)))
    spark.sql("DROP TABLE IF EXISTS windowed")
  }

  test("stream-stream join: watermarked time-range join emits matches, drops late") {
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val impDf = imps.toDF().toDF("imp_ts", "ad_id").withWatermark("imp_ts", "10 minutes")
    val clkDf = clicks.toDF().toDF("clk_ts", "c_ad_id").withWatermark("clk_ts", "10 minutes")
    // click attributes to an impression of the same ad within [0, 15 min)
    val joined = impDf.join(clkDf,
      col("ad_id") === col("c_ad_id") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") < col("imp_ts") + expr("INTERVAL 15 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    imps.addData((t(0), 1L), (t(5), 2L))
    clicks.addData((t(10), 1L)) // within 15 min of imp(0) → match
    clicks.addData((t(40), 2L)) // 35 min after imp(5) → outside range
    q.processAllAvailable()
    val rows = spark.table("attrib")
      .selectExpr("ad_id", "date_format(imp_ts, 'HH:mm') AS i",
        "date_format(clk_ts, 'HH:mm') AS c")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    q.stop()
    assert(rows.toSeq === Seq((1L, "10:00", "10:10")))
    // state cleanup happened: the plan carries both watermarks and the
    // range condition, so neither side buffers unboundedly
    spark.sql("DROP TABLE IF EXISTS attrib")
  }

  test("streaming dedup: dropDuplicatesWithinWatermark absorbs replays") {
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val deduped = graft.streaming.StreamDedup.dedupWithinWatermark(
      mem.toDF().toDF("ts", "doc_id", "text"), Seq("doc_id"), "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    mem.addData((t(0), 1L, "a"), (t(1), 2L, "b"), (t(2), 1L, "a-dup"))
    q.processAllAvailable()
    mem.addData((t(3), 1L, "a-again"), (t(4), 3L, "c"))
    q.processAllAvailable()
    val ids = spark.table("dedup_stream").select("doc_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids === Seq(1L, 2L, 3L)) // replays of doc 1 dropped across batches
    // the guarantee is exactly-once WITHIN the horizon: advance the
    // watermark far past doc 1's entry (state evicted), then replay it —
    // the late duplicate is re-admitted, which is exactly why the
    // downstream keyed upsert stays in the topology for true end-to-end
    // idempotency
    mem.addData((t(40), 4L, "d")) // watermark → 10:30, evicts doc 1 state
    q.processAllAvailable()
    mem.addData((t(41), 1L, "a-after-horizon"))
    q.processAllAvailable()
    q.stop()
    val replayed = spark.table("dedup_stream").filter(col("doc_id") === 1L).count()
    assert(replayed === 2L) // original + post-horizon replay
    spark.sql("DROP TABLE IF EXISTS dedup_stream")
  }

  test("streaming MinHash-LSH near-dup: in-horizon near-clones pair, unrelated text never does") {
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again while the cat watches from the warm windowsill nearby"
    val pairs = graft.streaming.StreamNearDup.candidatePairs(
      mem.toDF().toDF("ts", "doc_id", "text"),
      "doc_id", "ts", "text", delay = "2 minutes", horizon = "10 minutes")
    val q = pairs.writeStream.format("memory").queryName("near_dup_stream")
      .outputMode("append").start()
    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // doc 2 is doc 1 with one word changed (near-clone, in horizon);
    // doc 3 is unrelated text; doc 4 pushes the watermark forward so
    // the join emits (append mode waits for watermark past ts+horizon)
    mem.addData(
      (t(0), 1L, base),
      (t(3), 2L, base.replace("warm", "cold")),
      (t(4), 3L, "completely different words about spark query engines " +
        "and distributed columnar execution at scale"))
    q.processAllAvailable()
    // doc 5: near-clone of doc 1 arriving in a LATER batch but still
    // inside the 10-minute horizon — must pair across batches; doc 6:
    // near-clone arriving far beyond the horizon — must NOT pair
    mem.addData((t(8), 5L, base.replace("cat", "dog")))
    q.processAllAvailable()
    mem.addData((t(40), 6L, base.replace("fox", "hare"))) // wm → 10:38
    q.processAllAvailable()
    val got = spark.table("near_dup_stream")
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L))) // the near-clone pair, >= 1 shared band
    assert(got.contains((1L, 5L)) && got.contains((2L, 5L)),
      s"cross-batch in-horizon pair missing: $got")
    assert(!got.exists { case (x, y) => x == 6L || y == 6L },
      s"beyond-horizon doc paired: $got")
    assert(got.forall { case (x, y) => Set(x, y).subsetOf(Set(1L, 2L, 5L)) },
      s"unrelated doc paired: $got") // doc 3 shares no band with anyone
    // batch-path agreement: the same constants find the same pair
    val batch = graft.dedup.Dedup.minhashCandidates(
      spark.createDataFrame(Seq(
        (1L, base), (2L, base.replace("warm", "cold")))).toDF("id", "text"),
      col("id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch === Set((1L, 2L)))
    // state actually evicts: the time-range bound gives the join a
    // state-value watermark (the id-ordering conjunct must NOT break
    // its extraction, or band-key state would grow with the stream)
    mem.addData((t(55), 7L, "another watermark pusher"))
    q.processAllAvailable()
    val removed = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
    assert(removed > 0, "stream-stream join state was never cleaned up")
    q.stop()
    spark.sql("DROP TABLE IF EXISTS near_dup_stream")
  }

  test("streaming session windows (event-time gap sessionization)") {
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val agg = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    def t(min: Int, sec: Int = 0) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")
    // user 1: events at 10:00, 10:03, 10:06 chain into ONE session
    // (each within 5 min of the previous); 10:20 starts a second one
    mem.addData((t(0), 1L), (t(3), 1L), (t(6), 1L), (t(20), 1L))
    q.processAllAvailable()
    mem.addData((t(59), 1L)) // push watermark past both sessions
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions")
      .selectExpr("date_format(session_window.start, 'HH:mm') AS s", "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.getOrElse("10:00", 0L) === 3L)
    assert(got.getOrElse("10:20", 0L) === 1L)
    spark.sql("DROP TABLE IF EXISTS sessions")
  }

  test("transformWithState: typed per-key state across batches (Spark 4 API)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.TwsStats
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[TwsStats.In]
      val q = TwsStats.stream(mem.toDS()).writeStream
        .format("memory").queryName("tws").outputMode("update").start()
      mem.addData(TwsStats.In("a", 1.0), TwsStats.In("a", 3.0), TwsStats.In("b", 10.0))
      q.processAllAvailable()
      mem.addData(TwsStats.In("a", 5.0)) // state must survive the batch boundary
      q.processAllAvailable()
      val last = spark.table("tws").collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      q.stop()
      assert(last("a") === ((3L, 3.0, 4.0))) // n=3, mean=3, var={1,3,5}=4
      assert(last("b") === ((1L, 10.0, 0.0)))
      spark.sql("DROP TABLE IF EXISTS tws")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stateful streaming per-key stats accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Welford.In]
    val out = CountryStatsStream.runningStats(mem.toDS())
    val q = out.writeStream.format("memory").queryName("country_stats")
      .outputMode("update").start()
    mem.addData(Welford.In("FR", 6.0, 5.5), Welford.In("FR", 7.0, 7.5))
    q.processAllAvailable()
    mem.addData(Welford.In("FR", 6.5, 6.0))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("country_stats")
      .orderBy(col("n").desc).head()
    assert(last.getAs[Long]("n") === 3L) // state carried across batches
    spark.sql("DROP TABLE IF EXISTS country_stats")
  }

  test("streaming per-group top-k: the bounded-heap aggregate holds state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double, Long)]
    val out = mem.toDF().toDF("g", "s", "id")
      .groupBy("g")
      .agg(graft.expressions.TopKAgg.top_k_ids(col("s"), col("id"), 2).as("top"))
    val q = out.writeStream.format("memory").queryName("stream_topk")
      .outputMode("update").start()
    mem.addData((1L, 5.0, 100L), (1L, 9.0, 101L))
    q.processAllAvailable()
    // a later batch brings a new global best; the old 2nd-best must drop
    mem.addData((1L, 7.0, 102L))
    q.processAllAvailable()
    q.stop()
    val top = spark.table("stream_topk").orderBy(col("g"))
      .select(explode(col("top")).as("e")).select(col("e.id"))
      .collect().map(_.getLong(0)).toList
    // last update row: ids 101 (9.0) then 102 (7.0)
    assert(top.takeRight(2) === List(101L, 102L))
    spark.sql("DROP TABLE IF EXISTS stream_topk")
  }
}

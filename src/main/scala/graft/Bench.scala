package graft

import org.apache.spark.sql.functions._

/** Driver-run benchmark: every SparkEntry query timed on
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * A short untimed warmup (scan + agg + broadcast join) pays the
  * session's one-time costs (codegen/JIT, broadcast machinery, parquet
  * footer reads) so per-query numbers measure the queries, not startup.
  */
object Bench {

  /** 1-minute load average, or -1 where /proc is unavailable. Recorded in
    * the artifact because a concurrent sbt/test run on the same box
    * inflates timings 3-14x (round 4's 245s vs 85s solo) — the JSON must
    * be self-identifying as contended or clean.
    */
  private def loadAvg(): Double =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // Contended-bench hygiene: a concurrent sbt/test run inflates timings
    // 3-14x (round 4: 245s contended vs 85s solo). If the box is loaded at
    // start, sleep-and-retry ONCE — most contention here is a test suite
    // finishing — then record whatever loadavg we actually ran under, so
    // the artifact is either solo or self-flagged `contended`.
    var loadStart = loadAvg()
    var retried = false
    if (loadStart > 2.0) {
      System.err.println(f"WARN: loadavg at bench start is $loadStart%.2f — " +
        "box is contended; sleeping 90s and retrying once before benching.")
      Thread.sleep(90000)
      retried = true
      loadStart = loadAvg()
      if (loadStart > 2.0)
        System.err.println(f"WARN: still contended after retry " +
          f"($loadStart%.2f) — proceeding; artifact will carry contended:true.")
    }
    val tsStart = System.currentTimeMillis()
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt, "graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: exercise scan, shuffle, broadcast-join, window codegen paths
    val li = Tables.load(spark, sfDir, "lineitem").limit(10000)
    val o = Tables.load(spark, sfDir, "orders").limit(1000)
    li.join(broadcast(o), li("l_orderkey") === o("o_orderkey"))
      .groupBy("l_returnflag").agg(sum("l_quantity")).collect()

    // noop sink: forces FULL computation of every output column —
    // a bare count() would let Catalyst prune the projections the
    // query exists to measure.
    // Optional name filter for fast local iteration (mirrors Verify);
    // the driver sets nothing and benches the full set.
    val selected = SparkEntry.selected(sys.env.get("SPARK_GRAFT_ONLY"))
    // SPARK_GRAFT_BENCH_WARM=1 runs each query once untimed first, so
    // the recorded number measures throughput rather than the one-time
    // Catalyst planning + interpreter JIT that dominates the heaviest
    // expression-tree queries at small SFs (q100: 10.9s cold vs 1.3s
    // warm). The driver leaves it unset → cold, comparable across
    // rounds; BENCH_NOTES quotes warm numbers from this switch.
    val warm = sys.env.get("SPARK_GRAFT_BENCH_WARM").contains("1")
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Unit =
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => () }
      if (warm) once()
      val t0 = System.nanoTime()
      once()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val loadEnd = loadAvg()
    val tsEnd = System.currentTimeMillis()
    // driver heap ceiling (build.sbt -Xmx, SPARK_DRIVER_MEM): recorded
    // so constrained-memory runs are self-identifying evidence — a
    // "no OOM at sf0.3" claim is only meaningful with the ceiling in
    // the artifact
    val memMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val env = s""""env":{"cpus":$cpus,"loadavg_start":$loadStart,""" +
      s""""loadavg_end":$loadEnd,"ts_start_ms":$tsStart,"ts_end_ms":$tsEnd,""" +
      s""""contended":${loadStart > 2.0},"retried":$retried,"mem_mb":$memMb,""" +
      s""""mode":"${if (warm) "warm" else "cold"}"}"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",$env}"""
    println(json)
    // durable copy: the driver captures stdout with a bounded tail, which
    // truncated round 2's artifact — the file survives regardless
    val out = java.nio.file.Paths.get("target", "bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, json.getBytes("UTF-8")): Unit
    spark.stop()
  }
}

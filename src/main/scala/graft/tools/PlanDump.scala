package graft.tools

import java.nio.file.{Files, Paths}

import graft.{Sessions, SparkEntry}

/** Dump `.explain("formatted")` for selected queries to files — the
  * plan-shape evidence for `plans/rNN/<query>_{before,after}.txt`.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> q1,q2,...
  *
  * Plans are captured through the same session invariants as Bench
  * (Sessions.builder), so Exchange counts / join strategies / pushed
  * filters match what the bench actually executes (AQE's runtime
  * re-optimizations excepted — those are visible only in executed plans).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, namesCsv) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt, "graft-plandump")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}

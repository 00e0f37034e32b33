ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "workshop3etlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses Bench's one-line JSON from stdout; sbt's default
// LoggedOutput would prefix every forked-process line with "[info] "
// and break that parse. StdoutOutput passes the child's stdout through.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // -Xms = -Xmx + pre-touch: with a dynamic committed heap, G1
  // expand/uncommit cycles put tens of GB of OS page-zeroing INSIDE
  // GC pauses and allocation stalls at large -Xmx — measured at the
  // grading config (89 GiB): q217 58.5→94.8 s with 51 s of GC in 5
  // collections, q222 85.6 s at foreign CPU 0.0 (BENCH_r12's
  // unexplained 55.5 s outlier, reproduced). Pinning the heap and
  // paying first-touch at JVM start (untimed) makes the same queries
  // 7.1 s / 6.0 s with GC 0.26 / 0.01 s. See BENCH_NOTES round 13.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
  // constrained-heap runs (SPARK_DRIVER_MEM=2g at sf1) die with
  // "Retried waiting for GCLocker too often" — G1 GCLocker starvation
  // under 32 allocating threads + native parquet JNI critical regions,
  // a spurious OOM (default retry count is 2), not heap exhaustion
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
)
// Diagnostics passthrough for profiling runs (e.g. -Xlog:gc* while
// reproducing a driver-config anomaly). Unset in normal/driver runs.
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_JVM")
  .map(_.trim.split("\\s+").toSeq.filter(_.nonEmpty))
  .getOrElse(Seq.empty)

// Live-integration mode (`sbt -Dgraft.it=1 …`, see it/README.md): adds
// the Kafka connector + Postgres JDBC driver so the two endpoint-gated
// probes in ProductionTransportSpec run against the real containers in
// it/docker-compose.yml — same tests, zero code edits; they gate on
// classpath + endpoint and cancel cleanly otherwise. WITHOUT the flag
// this list is empty, so the sandbox build stays jar-free and fully
// offline (COURSIER_MODE=offline never attempts these).
libraryDependencies ++= (
  if (sys.props.get("graft.it").contains("1")) Seq(
    "org.apache.spark" %% "spark-sql-kafka-0-10" % "4.1.2" % Test,
    "org.postgresql" % "postgresql" % "42.7.7" % Test,
  ) else Seq.empty)

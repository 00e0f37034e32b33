package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM, one session — SparkSessions
  * are expensive; suites must not depend on session-level state). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.builder("local[4]", 4, "graft-test")
    .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
    .getOrCreate()

  val sf0001 = "/root/testdata/sf0.001"
  val refData = "/root/reference/data"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

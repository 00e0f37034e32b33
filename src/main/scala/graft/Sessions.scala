package graft

import org.apache.spark.sql.SparkSession

/** One place to construct graft SparkSessions so every entry point
  * (Bench, Verify, pipelines, tools, tests) agrees on the session-level
  * invariants the engine assumes:
  *
  *   - `spark.sql.session.timeZone = UTC` — Tables.load normalizes the
  *     events `ts` column from either TIMESTAMP(NANOS)-as-long or
  *     TIMESTAMP_NTZ physical encodings, and the NTZ→TimestampType cast
  *     is only value-preserving under a UTC session zone.
  *   - `spark.sql.legacy.parquet.nanosAsLong = true` — Spark 4 refuses
  *     TIMESTAMP(NANOS) parquet columns outright without it; setting it
  *     at session build (not inside the loader) keeps Tables.load free
  *     of conf mutation, per standard "loaders don't own session state".
  *   - AQE on, shuffle partitions sized to the local core count instead
  *     of the 200 default (local[32] has no 200-way parallelism to use).
  */
object Sessions {
  def builder(master: String,
              shufflePartitions: Int,
              appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
}

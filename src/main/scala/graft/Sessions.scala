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
  *   - `InferFiltersFromGenerate` excluded from the optimizer: the rule
  *     copies a Generate's INPUT EXPRESSION into inferred
  *     `isnotnull(...)` / `size(...) > 0` filter conjuncts below the
  *     Generate. For this engine's hot paths the generator input is an
  *     expensive per-row array pipeline (tokenize → n-gram → md5 per
  *     shingle; minhash banding; media walks), so the inferred filter
  *     re-evaluates the whole pipeline once more per row — q138's
  *     executed plan carried the md5-gram array THREE times (twice in
  *     the inferred Filter, once in the Project). The rule's upside
  *     (early pruning of rows whose generated array would be empty) is
  *     exactly what the Generate itself already does one operator
  *     later. Measured (r14, sf0.1, solo): q138 6.05 → 1.90 s, q53
  *     2.5×, q93 1.9×, q96/q149/q220/q235/q197 1.2–1.4×; no
  *     regression outside the ±15% epoch noise band on a 10-query
  *     suspect A/B (2 runs per config). Guide §4.4 — stop the
  *     optimizer duplicating expensive expressions — applied at the
  *     session level, scale-independent (the duplicated work is CPU
  *     per scanned row at any corpus size).
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
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
}

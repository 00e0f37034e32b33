package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the driver-provided star-schema testdata
  * (TESTDATA.md: region nation customer supplier part orders lineitem
  * events documents embeddings). Every SparkEntry query reads through
  * here so scans stay uniform (parquet → columnar scan with pushdown).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.parquet has shipped with two physical types for `ts`:
      // TIMESTAMP(NANOS), which Spark 4 only reads as a long via the
      // legacy nanosAsLong flag (set at session build — Sessions.builder;
      // without it the read below fails loudly on the nanos fixture), and
      // plain TIMESTAMP(MICROS) with no UTC adjustment, which it reads as
      // TIMESTAMP_NTZ. Normalize either to a session TimestampType so
      // downstream queries and the ScaleUp round-trip see one schema.
      // The NTZ→Timestamp cast is value-preserving ONLY under a UTC
      // session zone, so assert it instead of silently shifting.
      require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
        "graft sessions must run with spark.sql.session.timeZone=UTC " +
          "(use Sessions.builder): the events TIMESTAMP_NTZ normalization " +
          "is only value-preserving in UTC")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      raw.schema("ts").dataType match {
        case LongType =>
          // integer division: `/` on columns is DOUBLE division, which at
          // ~1.7e18 nanos exceeds double's 53-bit mantissa and rounds the
          // microsecond (caught by q110's exact-timestamp compare)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType | TimestampType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case other =>
          // a StringType/DoubleType ts would CAST without error but with
          // parse/seconds-as-double semantics — garbage values, silently.
          // A malformed fixture must fail loudly instead.
          throw new IllegalStateException(
            s"events.parquet ts column has unexpected type $other; " +
              "expected INT64(nanos-as-long), TIMESTAMP_NTZ or TIMESTAMP")
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}

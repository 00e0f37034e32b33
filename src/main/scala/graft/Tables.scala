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
      // legacy flag, and plain TIMESTAMP(MICROS) with no UTC adjustment,
      // which it reads as TIMESTAMP_NTZ. Normalize either to a session
      // TimestampType (session zone is UTC everywhere in this project,
      // so the NTZ cast is value-preserving) so downstream queries and
      // the ScaleUp round-trip see one schema.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions._
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // integer division: `/` on columns is DOUBLE division, which at
          // ~1.7e18 nanos exceeds double's 53-bit mantissa and rounds the
          // microsecond (caught by q110's exact-timestamp compare)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ =>
          raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}

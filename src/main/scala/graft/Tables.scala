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
      // events.parquet carries TIMESTAMP(NANOS) which Spark 4 refuses by
      // default; read the nanos as a long and rebuild a (micro) timestamp.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions._
      // integer division: `/` on columns is DOUBLE division, which at
      // ~1.7e18 nanos exceeds double's 53-bit mantissa and rounds the
      // microsecond (caught by q110's exact-timestamp compare)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}

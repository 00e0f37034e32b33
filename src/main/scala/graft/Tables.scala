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
      raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}

package graft

import java.nio.file.Files


import org.apache.spark.sql.functions._

import graft.etl.{Clean, Normalize}
import graft.ml.Ols
import graft.streaming.{ScoringPipeline, Welford}

/** End-to-end streaming demo (the reference's producer→consumer path,
  * SURVEY §3.2–3.3): batch ETL → wire-format JSON files (producer) →
  * file-source Structured Stream → model scoring → idempotent keyed
  * warehouse merge + per-country running stats (consumer). Runs the
  * producer output through the SAME parse/score/upsert code the Kafka
  * path would use — only the source format differs (this container has
  * no Kafka broker/connector).
  *
  * Usage: runMain graft.StreamingDemo [dataDir]
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/reference/data")
    val work = Files.createTempDirectory("graft_stream_demo").toString
    val spark = Sessions.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]", 8,
      "streaming-demo").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- producer: unified data + flags → JSON wire files
    val unified = Clean.dropNulls(
      Normalize.loadUnified(spark, dataDir), Normalize.Canonical)
    val flagged = Ols.withSplitFlags(unified, Seq("Country", "Year"))
      .withColumn("y_true", col("Happiness Score"))
    val model = Ols.fit(flagged.filter(col("is_train") === 1),
      Normalize.Features, Normalize.Target)
    ScoringPipeline.toWire(flagged)
      .write.mode("overwrite").text(s"$work/wire")
    println(s"producer: wrote ${flagged.count()} wire records to $work/wire")

    // ---- consumer: file stream → parse → score → merge + running stats
    val stream = spark.readStream
      .schema("value STRING")
      .text(s"$work/wire")
    val table = s"$work/predictions"
    val query = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val scored = ScoringPipeline.score(
          ScoringPipeline.parseWire(batch, col("value")), model)
        ScoringPipeline.upsertBatch(scored, table)
        val stats = scored
          .select(col("Country").as("key"), col("y_true").as("y"),
            col("y_pred").as("yPred"))
          .as[Welford.In]
          .groupByKey(_.key)
          .mapGroups { (k, rows) =>
            val buf = rows.foldLeft(Welford.Buf.zero)((b, r) => b.update(r.y, r.yPred))
            (k, buf.n, buf.mae.getOrElse(Double.NaN), buf.r2.getOrElse(Double.NaN))
          }.toDF("country", "n", "mae", "r2")
        println(s"batch $id: upserted; sample running stats:")
        stats.orderBy(col("n").desc).show(5, false)
      }
      .option("checkpointLocation", s"$work/ckpt")
      .start()
    query.processAllAvailable()
    query.stop()

    // the merge sink writes versioned vNNNNNNNN dirs — read the
    // committed snapshot through its reader, not the bare root
    val warehouse = graft.streaming.UpsertSink.ParquetMergeSink.read(spark, table)
    println(s"warehouse rows: ${warehouse.count()} (expect 781, replay-safe)")
    graft.analytics.Views.register(spark, warehouse.select(
      col("Country").as("country"), col("Year").as("year"),
      col("y_true"), col("y_pred"), col("is_train"), col("is_test")))
    spark.sql("SELECT * FROM kpis_globales").show(false)
    spark.stop()
  }
}

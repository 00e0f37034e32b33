package graft.tools

import org.apache.spark.sql.functions._

/** Temporary stage-timing probe for the PQ pipeline. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Sessions.builder("local[32]", 32, "pq-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = graft.Tables.load(spark, dir, "embeddings")
    val cents = t("trainChecked") {
      graft.similarity.Pq.trainChecked(e, 8, 16, 2)
    }
    t("encode count") {
      graft.similarity.Pq.encode(e, cents).write.format("noop")
        .mode("overwrite").save()
    }
    t("adcTopK") {
      graft.similarity.Pq
        .adcTopK(e, cents, e.filter(col("vec_id") < 20), 3, 9)
        .write.format("noop").mode("overwrite").save()
    }
    t("adcTopK again") {
      graft.similarity.Pq
        .adcTopK(e, cents, e.filter(col("vec_id") < 20), 3, 9)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

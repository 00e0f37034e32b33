package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  lazy val media = {
    val rows = (0L until 10L).map { i =>
      Row(i, Array.fill[Byte]((i * 512 + 64).toInt)((i % 127).toByte),
        Row("img", 64, 64, null, null))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("extractFeatures: fixed-dim float features, deterministic") {
    val f1 = Multimodal.extractFeatures(media, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(media, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1.size === 10)
    assert(f1.values.forall(_.size === 16))
    assert(f1 === f2)
    assert(f1(1L) !== f1(2L)) // different payloads → different features
  }

  test("sampleFrames: every-N frame windows of the payload") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 9), everyN = 2,
      frameBytes = 512)
    val idx = frames.select("frame_idx").collect().map(_.getInt(0)).toSeq
    assert(idx === Seq(0, 2, 4, 6, 8))
  }

  test("repartitionForPayloads sizes partitions by byte budget") {
    val parts = Multimodal.repartitionForPayloads(media, targetBytes = 1024)
      .rdd.getNumPartitions
    assert(parts > 1) // ~25 KB of payload / 1 KB budget → many partitions
  }
}

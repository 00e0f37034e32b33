package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Ivf, Similarity}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("train partitions the corpus into nlist cells; every row assigned") {
    val e = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val idx = Ivf.train(e, nlist = 8, iters = 3)
    assert(idx.centroids.length === 8)
    assert(idx.centroids.forall(_.length === 64))
    val cells = idx.assigned.groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cells.values.sum === e.count())
    assert(cells.keys.forall(c => c >= 0 && c < 8))
    assert(cells.size > 1, "k-means collapsed to a single cell")
  }

  test("clustered toy data: probing 1 cell finds the true neighbors") {
    // two tight clusters far apart — IVF must route queries to the
    // right cell and find in-cluster neighbors with nprobe=1
    val rows = (0 until 20).map { i =>
      val base = if (i < 10) Array(10.0f, 0.0f, 0.0f, 0.0f)
      else Array(0.0f, 10.0f, 0.0f, 0.0f)
      (i.toLong, base.zipWithIndex.map { case (v, d) =>
        v + ((i * 7 + d) % 5) * 0.01f
      })
    }
    val df = rows.toDF("vec_id", "embedding")
    val idx = Ivf.train(df, nlist = 2, iters = 4)
    val got = Ivf.topK(idx, df.filter(col("vec_id") === 0), k = 3, nprobe = 1)
      .collect().map(_.getLong(2)).toSet
    assert(got.subsetOf((1L to 9L).toSet), s"crossed clusters: $got")
    assert(got.size === 3)
  }

  test("recall vs brute force on real embeddings (near-random data)") {
    val e = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val idx = Ivf.train(e, nlist = 8, iters = 3)
    val brute = Similarity.bruteForceTopK(e, q, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // probing half the cells must recall a decent share even on
    // unclustered data (worst case for IVF)
    val ivf = Ivf.topK(idx, q, k = 5, nprobe = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (k2, rs) => k2 -> rs.map(_.getLong(2)).toSet }
    val hits = brute.count { case (qid, nn) => ivf.getOrElse(qid, Set.empty).contains(nn) }
    assert(hits >= brute.size / 2, s"recall $hits/${brute.size}")
  }

  test("cellBalance: all cells reported (empty included), shares sum to 1") {
    val e = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val idx = Ivf.trainChecked(e, nlist = 8, iters = 3)
    val rows = Ivf.cellBalance(idx)
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq === (0L until 8L)) // every cell, ordered
    assert(rows.map(_._2).sum === e.count())       // occupancies partition
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    // imbalance averages to 1 by construction
    assert(math.abs(rows.map(_._4).sum / 8 - 1.0) < 1e-4)
  }

  test("recall audit (q163): exhaustive probe recovers brute truth exactly") {
    import spark.implicits._
    val e = graft.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val queries = e.filter(col("vec_id") < 20)
    val idx = Ivf.trainChecked(e, nlist = 8, iters = 3)
    // nprobe = nlist scans every cell: the candidate set is the whole
    // corpus, so IVF top-k must equal brute-force top-k row for row
    val ivf = Ivf.topK(idx, queries, k = 3, nprobe = 8)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)]
      .collect().toSet
    val brute = Similarity.bruteForceTopK(e, queries, 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)]
      .collect().toSet
    assert(ivf === brute)
  }

  test("autoNlist: 4·√n clamped to [4, n/8]") {
    assert(Ivf.autoNlist(500) === 62)   // n/8 binds
    assert(Ivf.autoNlist(2000) === 178) // 4·√n binds
    assert(Ivf.autoNlist(10) === 4)     // floor binds
    assert(Ivf.autoNlist(1000000) === 4000)
  }

  test("tuneNprobe: monotone in target, exact at target 1.0") {
    val e = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val idx = Ivf.trainChecked(e, nlist = Ivf.autoNlist(e.count()), iters = 5)
    val np90 = Ivf.tuneNprobe(idx, k = 3, targetRecall = 0.9, sampleSize = 32)
    val np100 = Ivf.tuneNprobe(idx, k = 3, targetRecall = 1.0, sampleSize = 32)
    assert(np90 >= 1 && np90 <= idx.centroids.length)
    assert(np100 >= np90, "higher target must not pick a shallower probe")
    // at the 1.0-target depth, every sampled true neighbor is covered,
    // so sample recall is exactly 1 — verify through the delivered path
    val sample = idx.assigned
      .orderBy(graft.dedup.Dedup.md5Hash32(
        concat(col("vec_id").cast("string"), lit("tune"))).asc, col("vec_id").asc)
      .limit(32).select(col("vec_id"), col("embedding"))
    val truth = Similarity.bruteForceTopK(idx.assigned, sample, 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = Ivf.topK(idx, sample, k = 3, nprobe = np100)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(truth === got)
  }

  test("auto-tuned q163 audit: self-chosen operating point delivers the target") {
    import spark.implicits._
    val rows = graft.queries.TextSim.q163_ann_recall(spark, TestSpark.sf0001)
      .select("recall", "nlist", "nprobe", "scan_frac")
      .as[(Double, Long, Long, Double)].collect()
    assert(rows.length === 20)
    val avgRecall = rows.map(_._1).sum / rows.length
    val avgScan = rows.map(_._4).sum / rows.length
    assert(avgRecall >= 0.9, s"delivered recall $avgRecall below 0.9")
    assert(avgScan < 0.5, s"probe cost $avgScan not under half the corpus")
    assert(rows.head._2 === 62L) // autoNlist(500)
    assert(rows.forall(r => r._3 >= 1 && r._3 <= r._2))
  }
}

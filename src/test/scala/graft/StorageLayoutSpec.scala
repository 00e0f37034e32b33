package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Storage-layout scale mechanisms (SURVEY §4 / the 100 TB design
  * toolkit): bucketing for shuffle-free co-located joins and partition
  * pruning for scan elimination. These are the layout decisions a
  * 1000-executor deployment makes BEFORE any query runs — pinned here
  * at test scale by asserting on the executed plans, not just results.
  */
class StorageLayoutSpec extends SparkSpec {

  test("bucketed tables co-locate the join: no shuffle exchange on either side") {
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.load(spark, TestSpark.sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    // both sides bucketed by the join key into the SAME bucket count:
    // at 100 TB this is the difference between a full 2-sided shuffle
    // of the fact table per join and none at all
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // the join itself must read bucketed scans directly — the ONLY
      // acceptable exchange would be none at all (bucketed on the key)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"left side re-shuffled despite bucketing:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"right side re-shuffled despite bucketing:\n$plan")
      // bucketed scans advertise their bucket count
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("partition pruning: a filtered scan reads only the matching directory") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events_by_type"
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
      .select("event_type", "user_id", "value")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
      .agg(count(lit(1)).as("n"))
    q.collect()
    val scan = q.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory pruning),
    // not PushedFilters (row-group pruning) — at 100 TB that's the
    // difference between listing one partition and scanning the table
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition filter in scan:\n$scan")
    val expected = ev.filter(col("event_type") === "click").count()
    assert(q.collect().head.getLong(0) === expected)
  }

  test("dynamic partition pruning: dimension filter prunes the fact scan at runtime") {
    val base = Files.createTempDirectory("graft_dpp").toString
    val factDir = base + "/li_by_rf"
    val dimDir = base + "/rf_dim"
    Tables.load(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .write.partitionBy("l_returnflag").mode("overwrite").parquet(factDir)
    // the dimension must be a FILE-backed relation: an in-memory
    // LocalRelation gets its filter constant-folded into the relation
    // itself, so PartitionPruning no longer sees a selective predicate
    // on the dim side and declines to inject the runtime filter
    spark.createDataFrame(Seq(("A", "keep"), ("N", "drop"), ("R", "drop")))
      .toDF("rf", "label").write.mode("overwrite").parquet(dimDir)
    val fact = spark.read.parquet(factDir)
    val dim = spark.read.parquet(dimDir)
    val prev = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // at test scale the fact is a few hundred KB, so the stats-based
      // benefit estimate (prunedSize > dim broadcast overhead) is noise;
      // force the fallback ratio path the way a real deployment tunes it
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10.0")
      // joined on the PARTITION column, so DPP can turn the dim filter
      // into a runtime IN-subquery partition filter on the fact scan
      val q = fact.join(broadcast(dim.filter(col("label") === "keep")),
        fact("l_returnflag") === dim("rf"))
        .agg(sum("l_quantity").as("s"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n$plan")
      // and the pruning actually landed on the fact scan's partition
      // filters — the 100×-scale scan-elimination mechanism itself
      assert(plan.contains("PartitionFilters") &&
        plan.toLowerCase.contains("dynamicpruningexpression"),
        s"fact scan has no runtime partition filter:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("IVF-PQ code table partitioned by cell: probes prune the scan at the source") {
    import graft.similarity.{Ivf, Pq}
    val e = Tables.load(spark, TestSpark.sf0001, "embeddings")
    val idx = Ivf.trainChecked(e, nlist = 8, iters = 3)
    val cents = Pq.trainChecked(e, m = 8, ksub = 16, iters = 2)
    val dir = Files.createTempDirectory("graft_ivfpq_store").toString + "/codes"
    // the production store: (vec_id, codes) partitioned by cell
    Pq.encode(e, cents)
      .join(idx.assigned.select(col("vec_id"), col("cell")), "vec_id")
      .write.partitionBy("cell").mode("overwrite").parquet(dir)
    // probe cells for a query batch are model-sized by design — they
    // reach the scan as literal partition predicates
    val probeCells = Ivf.probeRanks(idx, e.filter(col("vec_id") < 5))
      .filter(col("pr") <= 2).select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(probeCells.length < 8, "probe set must be a strict cell subset")
    val store = spark.read.parquet(dir)
    val scan = store.filter(col("cell").isin(probeCells.map(Integer.valueOf): _*))
    val plan = scan.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[cell#\\d+ IN \\(".r.findFirstIn(plan).isDefined,
      s"probe cells did not land in PartitionFilters:\n$plan")
    // and the pruned scan returns exactly the probed cells' members
    val expected = idx.assigned.filter(col("cell").isin(probeCells.map(Integer.valueOf): _*)).count()
    assert(scan.count() === expected)
  }

  test("runtime bloom filter: selective dim join prunes the fact scan on a NON-partition key") {
    // DPP needs the join key to be the partition column; the runtime
    // bloom filter is the complementary mechanism for every other key:
    // the selective dim side builds a bloom aggregate and the fact side
    // filters rows before the shuffle. At 100 TB this cuts the shuffled
    // fact volume by the dim's selectivity without any layout change.
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, TestSpark.sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    // expected value computed BEFORE any conf changes — an independent
    // plan (default confs, no injected filter) must agree
    val expected = li.join(o.filter(col("o_totalprice") < 1000.0),
        col("l_orderkey") === col("o_orderkey"))
      .agg(sum("l_quantity")).head().get(0)
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // the application-side size gate defaults to 10GB — at test scale
      // drop it to 0 the way the fact side would qualify in production
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: with a broadcast the filter is moot
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = li.join(o.filter(col("o_totalprice") < 1000.0),
          col("l_orderkey") === col("o_orderkey"))
        .agg(sum("l_quantity").as("s"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("mightcontain") || plan.contains("bloomfilter"),
        s"no runtime bloom filter in executed plan:\n$plan")
      // correctness under the injected filter
      assert(q.head().get(0) === expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("z-order clustering: box queries touch fewer chunks than a linear sort") {
    import graft.storage.ZOrder
    // a 64×64 grid of points, chunked into 64 "files" of 64 rows each;
    // chunk min/max stats decide which files a box predicate must read
    val pts = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    def chunksHit(ordered: org.apache.spark.sql.DataFrame): Long = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("ord") // test-scale only: 4096 rows on one partition
      ordered.withColumn("chunk", ((row_number().over(w) - 1) / 64).cast("long"))
        .groupBy("chunk")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        // a 16×16 box query in the middle: files whose stats intersect
        .filter(col("x1") >= 24 && col("x0") <= 39 &&
          col("y1") >= 24 && col("y0") <= 39)
        .count()
    }
    val zHit = chunksHit(pts.withColumn("ord",
      ZOrder.zValue(col("x"), col("y"), 6)))
    val linHit = chunksHit(pts.withColumn("ord", col("x") * 64 + col("y")))
    // row-major order: the 16-column x-band spans 16 chunks vertically;
    // the z-curve keeps the box in O(box-area/chunk) chunks
    assert(zHit < linHit, s"z=$zHit lin=$linHit")
    assert(zHit <= 12)
  }

  test("zValue matches its SQL twin bit-for-bit") {
    import graft.storage.ZOrder
    val df = spark.range(0, 1000).select(
      (col("id") % 37).as("x"), (col("id") % 53).as("y"))
    val mismatch = df
      .withColumn("a", ZOrder.zValue(col("x"), col("y"), 10))
      .withColumn("b", expr(ZOrder.zValueSql("x", "y", 10)))
      .filter(col("a") =!= col("b")).count()
    assert(mismatch === 0L)
  }
}
